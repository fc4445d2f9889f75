"""Op-level time breakdown of the stage-1 training step on real TPU.

Captures a perfetto trace of a few steps (jax.profiler) and aggregates
device-track event durations by fusion/op name — the measurement that
decides where (if anywhere) a Pallas kernel beats XLA (VERDICT #6 /
SURVEY §3.2 hot-loop candidates).

  python tools/profile_breakdown.py [--steps 5] [--stage init]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")


def aggregate_perfetto(path: str, min_ms: float = 0.05):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # metadata: process names (device vs host) and thread names (track
    # level). A device pid carries SEVERAL overlapping tracks — "XLA
    # Modules" (whole jit program), "XLA Ops" (fusions/custom calls),
    # "Steps"… Summing all of them double-counts every op inside its
    # module; aggregate the op-level track only.
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pnames[e.get("pid")] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tnames[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")

    def device_tids(level):
        out = set()
        for (pid, tid), tn in tnames.items():
            pn = str(pnames.get(pid, ""))
            if "TPU" not in pn and "/device" not in pn.lower():
                continue
            if level in tn:
                out.add((pid, tid))
        return out

    op_tids = device_tids("XLA Ops") or device_tids("Ops")
    mod_tids = device_tids("XLA Modules") or device_tids("Modules")
    per_op = collections.Counter()
    per_src = collections.Counter()
    total = module_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if key in mod_tids:
            module_total += dur
        if op_tids:
            if key not in op_tids:
                continue
        else:  # no thread metadata: fall back to all device events
            pn = str(pnames.get(e.get("pid"), ""))
            if "TPU" not in pn and "/device" not in pn.lower():
                continue
        per_op[e.get("name", "?")] += dur
        # source attribution: first repo-local frame of the source stack
        # (fusions inherit one representative op's stack — approximate but
        # far more actionable than HLO names)
        a = e.get("args") or {}
        src = ""
        for ln in (a.get("source_stack") or a.get("source") or "").split("\n"):
            if "/moda_tpu/" in ln or "/repo/" in ln:
                src = ln.strip()
                break
        cat = a.get("hlo_category", "?")
        per_src[(src or a.get("source", "?"), cat)] += dur
        total += dur
    return per_op, per_src, total, module_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--stage", default="init")
    ap.add_argument("--trace_dir", default="/tmp/moda_breakdown")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from moda_tpu.runtime import setup_jax
    setup_jax()
    import jax

    from bench import make_stage

    step, (params, opt_state, mvars, batch, extras), rays = make_stage(args.stage)
    key = jax.random.key(0)
    params, opt_state, aux, _ = step(params, opt_state, mvars, batch, extras, key)
    float(aux["total_loss"])  # warm through the tunnel

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir, create_perfetto_trace=True):
        for i in range(args.steps):
            params, opt_state, aux, _ = step(params, opt_state, mvars, batch,
                                             extras, jax.random.key(i + 1))
        float(aux["total_loss"])

    traces = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not traces:
        traces = sorted(glob.glob(os.path.join(
            args.trace_dir, "**", "perfetto_trace.json.gz"), recursive=True))
    if not traces:
        print("no perfetto trace found under", args.trace_dir)
        print(os.popen(f"find {args.trace_dir} -type f | head -20").read())
        return
    per_op, per_src, total, module_total = aggregate_perfetto(traces[-1])
    per_step = total / max(args.steps, 1)
    print(f"trace: {traces[-1]}")
    print(f"op-track device time: {total:.1f} ms over {args.steps} steps "
          f"({per_step:.1f} ms/step); module track: "
          f"{module_total / max(args.steps, 1):.1f} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / args.steps:9.3f}  {100 * ms / total:5.1f}  {name[:110]}")
    print(f"\n{'ms/step':>9}  {'%':>5}  source (first repo frame) | category")
    for (src, cat), ms in per_src.most_common(args.top):
        print(f"{ms / args.steps:9.3f}  {100 * ms / total:5.1f}  "
              f"{src[:90]} | {cat}")


if __name__ == "__main__":
    main()
