"""Fused Pallas TPU kernel for the NeRF-style MLP stack.

Why: the training step is HBM-bandwidth-bound. XLA evaluates the 8x256
trunk layer-by-layer, so every activation tensor ([R*S, 256] fp32 =
268 MB at the recipe's 2048x128 ray bundle) round-trips through HBM once
per layer forward and twice backward; assembling the trunk input
(concat of embedded xyz with per-ray codes broadcast over samples) costs
another ~160 MB materialization plus layout copies. This kernel keeps
the whole stack in VMEM: per grid step it loads one block of embedded
points and the block's per-ray codes, broadcasts codes across samples
in-register, runs every layer on the MXU in bf16 (fp32 accumulation),
and writes only the final [block, out+1] result. The backward kernel
rematerializes activations in VMEM (flash-attention-style), reduces
per-ray code grads over samples, and accumulates weight grads in VMEM
across the (sequential) TPU grid.

Multi-net fusion: several NeRFMLPs that consume the SAME per-point input
(e.g. the rgb trunk and the CSE-feature head both evaluate at the coarse
sample points, rendering.py:124-237 + 158-166) run in ONE kernel launch:
the block DMA, the in-kernel positional embed, and the grid sequencing
are paid once instead of per net. The narrow nets are sequencing-bound
(the per-matmul issue tax dominates at W<=128), so riding them on the
trunk's grid is nearly free — measured ~3 ms/step at the recipe bundle
vs separate launches.

Architecture mirrored (nets.NeRFMLP == reference nnutils/nerf.py:83-198):
  t   = concat(x_e, code_trunk per-ray)          # trunk input
  h = t;  for i in range(D): h = relu(W_i @ (concat(t, h) if i in skips else h))
  sigma = W_sigma @ h
  hd  = relu(W_dir @ concat(W_final @ h, code_dir per-ray))
  out = concat(W_out @ hd, sigma)                # [N, out_ch+1]

The caller applies raw_feat/sigmoid semantics (nets.py:60-73).

Weights stay fp32 in HBM (the optimizer's master copy); the kernel casts
to bf16 at matmul inputs only. Gradients are fp32 end-to-end.
need_dx=False skips the input-gradient computation for call sites whose
inputs are stop-gradiented (the visibility loss, pipeline.py:441-457).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # compiled Mosaic kernels need real TPU hardware; CPU tests (and the
    # 8-virtual-device conftest backend) run the interpreter
    return jax.default_backend() != "tpu"


def _layer_names(D: int):
    return [f"xyz_{i+1}" for i in range(D)] + ["sigma", "xyz_final", "dir", "rgb"]


def flatten_params(p: dict, D: int) -> Tuple[jnp.ndarray, ...]:
    """flax NeRFMLP param dict -> flat (k1,b1,k2,b2,...) tuple.

    Biases are reshaped to [1, W]: TPU VMEM tiling wants >=2D operands."""
    out = []
    for n in _layer_names(D):
        out.append(p[n]["kernel"])
        out.append(p[n]["bias"].reshape(1, -1))
    return tuple(out)


def _mm(a, b, cdt):
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


class Arch:
    """Static per-net kernel configuration (hashable; nondiff arg).

    A fused launch takes a TUPLE of Arch: every net consumes the same
    per-point input block (and shares one optional code_trunk / code_dir
    operand — a net with ct=0/cd=0 simply ignores it). S / emb / need_dx
    are shared launch-level properties read from the first net."""

    def __init__(self, D, in_x, ct, cd, skips, S, need_dx=True,
                 sigmoid=False, emb=None, drop_sigma=False):
        self.D = D            # trunk depth
        self.in_x = in_x      # per-point input width (embedded xyz [+extras])
        self.ct = ct          # per-ray trunk code width (0 = none)
        self.cd = cd          # per-ray dir-branch code width (0 = none)
        self.skips = tuple(skips)
        self.S = S            # samples per ray (1 = per-point inputs)
        self.need_dx = need_dx
        self.sigmoid = sigmoid  # apply sigmoid to the rgb columns in-kernel
        # raw_feat call sites use only the rgb head: not emitting sigma
        # saves the head matmuls AND the XLA-side [N, :out] slice of the
        # result (a ~3 ms/step layout copy at the recipe bundle)
        self.drop_sigma = drop_sigma
        # emb = (C, F, logscale): x arrives RAW [N, C] and the positional
        # embedding to in_x = C*(2F+1) runs inside the kernel. The XLA-side
        # embed chain (scatter-matmul, sin/cos, window, concat + their
        # backward) materializes [N, 2FC]/[N, C] arrays whose minor dims
        # pad to 128 lanes — ~5.6 ms/step of layout traffic at the recipe
        # bundle across the step's embed call sites.
        self.emb = emb

    @property
    def emb_C(self):
        return self.emb[0] if self.emb else 0

    @property
    def emb_F(self):
        return self.emb[1] if self.emb else 0

    @property
    def nw(self):
        return 2 * (self.D + 4)  # D trunk layers + sigma/final/dir/rgb heads

    def key(self):
        return (self.D, self.in_x, self.ct, self.cd, self.skips, self.S,
                self.need_dx, self.sigmoid, self.emb, self.drop_sigma)

    def __hash__(self):
        return hash(self.key())

    def __eq__(self, o):
        return isinstance(o, Arch) and self.key() == o.key()


def _bcast_code(code, BR, S, c):
    return jnp.broadcast_to(code[:, None, :], (BR, S, c)).reshape(BR * S, c)


def _mm_f32(a, b):
    # full-precision matmul: the embed frequencies reach 2^(F-1); sin/cos
    # arguments lose all phase information in bf16
    return jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _embed_block(x, wemb, win, arch: Arch):
    """In-kernel positional embed: raw [BN, C] -> ([BN, C*(2F+1)], xf, trig).

    Matches core.embedding.positional_embed bit-for-bit: xf via the same
    one-nonzero-per-column scatter matmul in f32, sin/cos slot select,
    window multiply on the trig block only."""
    C = arch.emb_C
    xf = _mm_f32(x, wemb)
    col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
    is_sin = ((col // C) % 2) == 0
    trig = jnp.where(is_sin, jnp.sin(xf), jnp.cos(xf))
    emb = trig * win if win is not None else trig
    return jnp.concatenate([x, emb], -1), xf, trig


def _net_forward(xe, ct_code, cd_code, ws, arch: Arch, cdt, want_acts=False):
    """One pre-embedded [BN, in_x] block through one net's stack.
    ct_code/cd_code are the block's per-ray codes ([BR, ct]/[BR, cd]) or
    None (ignored unless arch.ct/arch.cd)."""
    D, skips = arch.D, arch.skips
    BN = xe.shape[0]
    BR = BN // arch.S
    if arch.ct:
        t = jnp.concatenate([xe, _bcast_code(ct_code, BR, arch.S, arch.ct)], -1)
    else:
        t = xe
    # acts are stored in cdt (bf16): that is exactly the value the next
    # matmul consumes (inputs are cast to cdt at every _mm), so the
    # backward's weight-grad matmuls and relu masks see identical bits
    # while the rematerialization buffers take half the VMEM
    acts = []
    h = t
    for i in range(D):
        if i in skips:
            h = jnp.concatenate([t, h], -1)
        if want_acts:
            acts.append(h.astype(cdt))
        h = jnp.maximum(_mm(h, ws[2 * i], cdt) + ws[2 * i + 1], 0.0)
    if want_acts:
        acts.append(h.astype(cdt))  # trunk output
    ksig, bsig = ws[2 * D], ws[2 * D + 1]
    kfin, bfin = ws[2 * D + 2], ws[2 * D + 3]
    kdir, bdir = ws[2 * D + 4], ws[2 * D + 5]
    kout, bout = ws[2 * D + 6], ws[2 * D + 7]
    sigma = None if arch.drop_sigma else _mm(h, ksig, cdt) + bsig
    h_final = _mm(h, kfin, cdt) + bfin
    if arch.cd:
        hd_in = jnp.concatenate(
            [h_final, _bcast_code(cd_code, BR, arch.S, arch.cd)], -1)
    else:
        hd_in = h_final
    if want_acts:
        acts.append(hd_in.astype(cdt))
    hd = jnp.maximum(_mm(hd_in, kdir, cdt) + bdir, 0.0)
    if want_acts:
        acts.append(hd.astype(cdt))
    rgb = _mm(hd, kout, cdt) + bout
    if arch.drop_sigma:
        return rgb, (acts if want_acts else None)
    if arch.sigmoid:
        # sigmoid applied in-kernel: the XLA-side sigmoid+re-concat on the
        # [N, out+1] result pads out+1 -> 128 lanes and costs ~1 ms/step
        # of pure layout traffic at the recipe bundle
        rgb = jax.nn.sigmoid(rgb)
    out = jnp.concatenate([rgb, sigma], -1)
    return out, (acts if want_acts else None)


def _net_backward(xe, ct_code, cd_code, ws, g, arch: Arch, cdt, acts=None):
    """VJP of one net's stack wrt (pre-embedded input, codes, weights).

    Returns (d_xe [BN, in_x], d_ct [BR,1,ct]|None, d_cd [BR,1,cd]|None,
    dws list). acts=None: activations are rematerialized here (VMEM,
    bf16). acts given (MODA_PALLAS_STASH=1 route): the forward stashed
    them to HBM in cdt and the recompute is skipped — the measured
    experiment behind BASELINE.md's remat-vs-stash section."""
    D, skips = arch.D, arch.skips
    if acts is None:
        out_fb, acts = _net_forward(xe, ct_code, cd_code, ws, arch, cdt,
                                    want_acts=True)
    else:
        out_fb = None
    h_trunk, hd_in, hd = acts[D], acts[D + 1], acts[D + 2]
    out_ch = g.shape[1] - (0 if arch.drop_sigma else 1)
    d_out = g[:, :out_ch]
    if arch.sigmoid:
        if out_fb is None:
            # stash route: re-derive the sigmoid output from the stashed
            # last hidden layer (one [BN, W_dir] x [W_dir, out] matmul)
            rgb = _mm(hd, ws[2 * D + 6], cdt) + ws[2 * D + 7]
            s = jax.nn.sigmoid(rgb)
        else:
            s = out_fb[:, :out_ch]  # forward recompute already applied sigmoid
        d_out = d_out * s * (1.0 - s)
    d_sigma = None if arch.drop_sigma else g[:, out_ch:]
    tin = arch.in_x + arch.ct  # trunk input width
    BN = xe.shape[0]
    BR = BN // arch.S

    dws = [None] * len(ws)

    def mmT_nt(a, b):  # a.T @ b
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_nt(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cdt), b.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dws[2 * D + 6] = mmT_nt(hd, d_out)
    dws[2 * D + 7] = d_out.sum(0, keepdims=True)
    # relu masks compare in f32 (Mosaic rejects bf16 cmpf on this target)
    d_hd = jnp.where(hd.astype(jnp.float32) > 0.0,
                     mm_nt(d_out, ws[2 * D + 6]), 0.0)
    dws[2 * D + 4] = mmT_nt(hd_in, d_hd)
    dws[2 * D + 5] = d_hd.sum(0, keepdims=True)
    d_hd_in = mm_nt(d_hd, ws[2 * D + 4])
    W_fin = ws[2 * D + 2].shape[1]
    d_h_final = d_hd_in[:, :W_fin]
    d_cd = None
    if arch.cd:
        d_cd = d_hd_in[:, W_fin:].reshape(BR, arch.S, arch.cd).sum(
            1, keepdims=True)
    dws[2 * D + 2] = mmT_nt(h_trunk, d_h_final)
    dws[2 * D + 3] = d_h_final.sum(0, keepdims=True)
    if arch.drop_sigma:
        dws[2 * D] = jnp.zeros(ws[2 * D].shape, jnp.float32)
        dws[2 * D + 1] = jnp.zeros(ws[2 * D + 1].shape, jnp.float32)
        d_h = mm_nt(d_h_final, ws[2 * D + 2])
    else:
        dws[2 * D] = mmT_nt(h_trunk, d_sigma)
        dws[2 * D + 1] = d_sigma.sum(0, keepdims=True)
        d_h = mm_nt(d_h_final, ws[2 * D + 2]) + mm_nt(d_sigma, ws[2 * D])

    d_t = jnp.zeros((BN, tin), jnp.float32)
    for i2 in range(D - 1, -1, -1):
        # relu output of layer i2 = acts[i2+1] (minus the skip re-concat)
        relu_out = acts[i2 + 1]
        if (i2 + 1) in skips and i2 + 1 < D:
            relu_out = relu_out[:, tin:]
        d_h = jnp.where(relu_out.astype(jnp.float32) > 0.0, d_h, 0.0)
        dws[2 * i2] = mmT_nt(acts[i2], d_h)
        dws[2 * i2 + 1] = d_h.sum(0, keepdims=True)
        d_in = mm_nt(d_h, ws[2 * i2])
        if i2 in skips:
            d_t = d_t + d_in[:, :tin]
            d_h = d_in[:, tin:]
        else:
            d_h = d_in
    d_t = d_t + d_h

    d_ct = None
    if arch.ct:
        d_ct = d_t[:, arch.in_x:].reshape(BR, arch.S, arch.ct).sum(
            1, keepdims=True)
    return d_t[:, :arch.in_x], d_ct, d_cd, dws


def _split_ws(ws, archs):
    """Flat weight list -> per-net slices (each net has 2*(D+4) arrays)."""
    out, i = [], 0
    for a in archs:
        out.append(ws[i:i + a.nw])
        i += a.nw
    return out


def _stash() -> bool:
    """MODA_PALLAS_STASH=1: forward kernels write the activation stack to
    HBM (in cdt) and the backward reads it instead of recomputing — the
    stash-vs-remat experiment (VERDICT r4 #4a). Read at trace time; both
    vjp halves trace together so the choice is consistent."""
    import os
    return os.environ.get("MODA_PALLAS_STASH") == "1"


def _act_widths(arch: Arch, ws):
    """Feature widths of the D+3 stashed activation tensors, read off the
    weight shapes (each act is the input of a known matmul)."""
    D = arch.D
    return [ws[2 * i].shape[0] for i in range(D)] + [
        ws[2 * D + 2].shape[0], ws[2 * D + 4].shape[0],
        ws[2 * D + 6].shape[0]]


def _split_acts(flat, widths):
    out, o = [], 0
    for w in widths:
        out.append(flat[:, o:o + w])
        o += w
    return out


def _fwd_kernel(archs, cdt, stash, *refs):
    a0 = archs[0]
    has_ct = any(a.ct for a in archs)
    has_cd = any(a.cd for a in archs)
    i = 0
    x = refs[i][:]; i += 1
    ct_code = cd_code = wemb = win = None
    if has_ct:
        ct = max(a.ct for a in archs)
        ct_code = refs[i][:].reshape(-1, ct); i += 1
    if has_cd:
        cd = max(a.cd for a in archs)
        cd_code = refs[i][:].reshape(-1, cd); i += 1
    if a0.emb:
        wemb = refs[i][:]; i += 1
        win = refs[i][:]; i += 1
    nw = sum(a.nw for a in archs)
    ws = [r[:] for r in refs[i:i + nw]]
    out_refs = refs[i + nw:i + nw + len(archs)]
    act_refs = refs[i + nw + len(archs):]  # stash route only
    if a0.emb:
        xe, _, _ = _embed_block(x, wemb, win, a0)
    else:
        xe = x
    for k, (a, ws_i, oref) in enumerate(
            zip(archs, _split_ws(ws, archs), out_refs)):
        out, acts = _net_forward(xe, ct_code if a.ct else None,
                                 cd_code if a.cd else None, ws_i, a, cdt,
                                 want_acts=stash)
        oref[:] = out
        if stash:
            act_refs[k][:] = jnp.concatenate(acts, -1)


def _bwd_kernel(archs, cdt, stash, *refs):
    """inputs: x, [ct], [cd], [wemb, win], g*, w*, [acts* (stash)]
    outputs: [dx], [dct], [dcd], [dwin], dw*"""
    a0 = archs[0]
    has_ct = any(a.ct for a in archs)
    has_cd = any(a.cd for a in archs)
    i = 0
    x = refs[i][:]; i += 1
    ct_code = cd_code = wemb = win = None
    ct = max((a.ct for a in archs), default=0)
    cd = max((a.cd for a in archs), default=0)
    if has_ct:
        ct_code = refs[i][:].reshape(-1, ct); i += 1
    if has_cd:
        cd_code = refs[i][:].reshape(-1, cd); i += 1
    if a0.emb:
        wemb = refs[i][:]; i += 1
        win = refs[i][:]; i += 1
    gs = [refs[i + k][:] for k in range(len(archs))]
    i += len(archs)
    nw = sum(a.nw for a in archs)
    ws = [r[:] for r in refs[i:i + nw]]
    i += nw
    per_net_ws = _split_ws(ws, archs)
    acts_per_net = [None] * len(archs)
    if stash:
        for k, (a, ws_i) in enumerate(zip(archs, per_net_ws)):
            acts_per_net[k] = _split_acts(refs[i][:], _act_widths(a, ws_i))
            i += 1
    outs = refs[i:]
    oi = 0
    dx_ref = dct_ref = dcd_ref = dwin_ref = None
    if a0.need_dx:
        dx_ref = outs[oi]; oi += 1
    if has_ct:
        dct_ref = outs[oi]; oi += 1
    if has_cd:
        dcd_ref = outs[oi]; oi += 1
    if a0.emb:
        dwin_ref = outs[oi]; oi += 1
    dw_refs = outs[oi:]

    if a0.emb:
        xe, xf, trig = _embed_block(x, wemb, win, a0)
    else:
        xe, xf, trig = x, None, None

    d_xe = None
    d_ct_tot = d_cd_tot = None
    dws_all = []
    for a, ws_i, g, acts_i in zip(archs, per_net_ws, gs, acts_per_net):
        d_xe_i, d_ct_i, d_cd_i, dws_i = _net_backward(
            xe, ct_code if a.ct else None, cd_code if a.cd else None,
            ws_i, g, a, cdt, acts=acts_i)
        d_xe = d_xe_i if d_xe is None else d_xe + d_xe_i
        if d_ct_i is not None:
            d_ct_tot = d_ct_i if d_ct_tot is None else d_ct_tot + d_ct_i
        if d_cd_i is not None:
            d_cd_tot = d_cd_i if d_cd_tot is None else d_cd_tot + d_cd_i
        dws_all.extend(dws_i)

    dwin = None
    if a0.emb:
        C = a0.emb_C
        d_emb = d_xe[:, C:a0.in_x]
        if dwin_ref is not None:
            dwin = (d_emb * trig).sum(0, keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, xf.shape, 1)
        is_sin = ((col // C) % 2) == 0
        dtrig = jnp.where(is_sin, jnp.cos(xf), -jnp.sin(xf))
        d_xf = d_emb * dtrig if win is None else d_emb * win * dtrig
        if dx_ref is not None:
            dx_ref[:] = d_xe[:, :C] + jax.lax.dot_general(
                d_xf, wemb, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    elif dx_ref is not None:
        dx_ref[:] = d_xe

    if dct_ref is not None:
        dct_ref[:] = d_ct_tot
    if dcd_ref is not None:
        dcd_ref[:] = d_cd_tot

    # weight-grad accumulation across the (sequential) grid: ONE
    # set/accumulate region pair for ALL refs — a @pl.when per ref (the
    # old form) emits ~2x#refs predicated regions per grid step, whose
    # control-flow overhead dominates the narrow-net backward (the
    # per-grid-step fixed cost this kernel is sequencing-bound on)
    first = pl.program_id(0) == 0
    updates = list(zip(dw_refs, dws_all))

    @pl.when(first)
    def _():
        if dwin_ref is not None:
            dwin_ref[:] = dwin
        for r, dw in updates:
            r[:] = dw.reshape(r.shape)

    @pl.when(jnp.logical_not(first))
    def _():
        if dwin_ref is not None:
            dwin_ref[:] = dwin_ref[:] + dwin
        for r, dw in updates:
            r[:] = r[:] + dw.reshape(r.shape)


def _pad_rows(x, bn):
    n = x.shape[0]
    pad = (-n) % bn
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    return x, n


def _w_specs(weights):
    return [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for w in weights]


def _cast_kernels(weights, cdt):
    """Layer kernels go into the Pallas call pre-cast to cdt: numerically
    identical (every matmul casts them anyway) but they sit in VMEM at
    half width and skip the in-kernel cast. Biases stay f32 — they are
    added to the f32 accumulator."""
    return [w.astype(cdt) if i % 2 == 0 else w
            for i, w in enumerate(weights)]


def _out_dim(a: Arch, weights) -> int:
    return weights[-2].shape[1] + (0 if a.drop_sigma else 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_mlp(x, ct_code, cd_code, win, weights, archs, block_rays,
              block_rays_bwd, cdt):
    """weights: flat tuple across nets (2*(D+4) arrays each, in archs
    order). Returns a tuple of per-net outputs [N, out_dim_i]."""
    out, _ = _fused_mlp_fwd(x, ct_code, cd_code, win, weights, archs,
                            block_rays, block_rays_bwd, cdt)
    return out


def _emb_operands(arch: Arch, win):
    """(specs, args) for the in-kernel embed: the [C, 2FC] scatter matrix
    and the [1, 2FC] window (always concrete — ones when unwindowed)."""
    from moda_tpu.core import embedding as EMB
    C, F, logscale = arch.emb
    wemb = jnp.asarray(EMB.scatter_matrix(C, F, logscale))
    specs = [
        pl.BlockSpec(wemb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F * 2 * C), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return specs, [wemb, win]


def _code_operands(code, c, BR, in_specs, args):
    # per-ray codes travel as [R, 1, c]: TPU block tiling constrains only
    # the LAST TWO dims, so (BR, 1, c) blocks keep the ray dim free
    cp, _ = _pad_rows(code, BR)
    in_specs.append(pl.BlockSpec((BR, 1, c), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(cp.reshape(-1, 1, c))


def _call_fwd(x, ct_code, cd_code, win, weights, archs, BR, cdt,
              stash=False):
    a0 = archs[0]
    S = a0.S
    xp, n = _pad_rows(x, BR * S)
    N = xp.shape[0]
    grid = (N // (BR * S),)
    in_specs = [pl.BlockSpec((BR * S, x.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [xp]
    if ct_code is not None:
        _code_operands(ct_code, ct_code.shape[-1], BR, in_specs, args)
    if cd_code is not None:
        _code_operands(cd_code, cd_code.shape[-1], BR, in_specs, args)
    if a0.emb:
        especs, eargs = _emb_operands(a0, win)
        in_specs += especs
        args += eargs
    in_specs += _w_specs(weights)
    per_net_ws = _split_ws(weights, archs)
    out_shapes = [jax.ShapeDtypeStruct((N, _out_dim(a, w)), jnp.float32)
                  for a, w in zip(archs, per_net_ws)]
    out_specs = [pl.BlockSpec((BR * S, _out_dim(a, w)), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
                 for a, w in zip(archs, per_net_ws)]
    if stash:
        for a, w in zip(archs, per_net_ws):
            tw = sum(_act_widths(a, w))
            out_shapes.append(jax.ShapeDtypeStruct((N, tw), cdt))
            out_specs.append(pl.BlockSpec((BR * S, tw), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, archs, cdt, stash),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_interpret(),
    )(*args, *_cast_kernels(weights, cdt))
    acts = tuple(outs[len(archs):]) if stash else None  # padded to N rows
    return tuple(o[:n] for o in outs[:len(archs)]), acts


def _fused_mlp_fwd(x, ct_code, cd_code, win, weights, archs, block_rays,
                   block_rays_bwd, cdt):
    out, acts = _call_fwd(x, ct_code, cd_code, win, weights, archs,
                          block_rays, cdt, stash=_stash())
    return out, (x, ct_code, cd_code, win, weights, acts)


def _fused_mlp_bwd(archs, block_rays, block_rays_bwd, cdt, res, gs):
    x, ct_code, cd_code, win, weights, acts = res
    stash = acts is not None
    a0 = archs[0]
    BR = block_rays_bwd
    S = a0.S
    xp, n = _pad_rows(x, BR * S)
    if stash and acts[0].shape[0] > xp.shape[0]:
        # the forward padded to its (larger) block multiple; match it so
        # the stashed rows line up block-for-block (bwd blocks divide fwd
        # blocks by the _block_policy power-of-two invariant)
        xp, _ = _pad_rows(
            jnp.concatenate([xp, jnp.zeros(
                (acts[0].shape[0] - xp.shape[0], x.shape[1]), x.dtype)], 0),
            BR * S)
    N = xp.shape[0]
    R = N // S
    grid = (N // (BR * S),)

    def _pad_pts(arr):
        p, _ = _pad_rows(arr, BR * S)
        if p.shape[0] < N:
            p = jnp.concatenate(
                [p, jnp.zeros((N - p.shape[0],) + p.shape[1:], p.dtype)], 0)
        return p

    def _pad_ray_rows(arr3):  # padded [R?,1,c] -> fwd-matched [R,1,c]
        if arr3.shape[0] < R:
            arr3 = jnp.concatenate(
                [arr3, jnp.zeros((R - arr3.shape[0], 1, arr3.shape[2]),
                                 arr3.dtype)], 0)
        return arr3

    in_specs = [pl.BlockSpec((BR * S, x.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [xp]
    if ct_code is not None:
        _code_operands(ct_code, ct_code.shape[-1], BR, in_specs, args)
        if stash:
            args[-1] = _pad_ray_rows(args[-1])
    if cd_code is not None:
        _code_operands(cd_code, cd_code.shape[-1], BR, in_specs, args)
        if stash:
            args[-1] = _pad_ray_rows(args[-1])
    if a0.emb:
        especs, eargs = _emb_operands(a0, win)
        in_specs += especs
        args += eargs
    for g in gs:
        gp = _pad_pts(g)
        in_specs.append(pl.BlockSpec((BR * S, g.shape[1]), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(gp)
    in_specs += _w_specs(weights)
    tail = ()  # operands appended AFTER the weights (order must match specs)
    if stash:
        for ac in acts:
            in_specs.append(pl.BlockSpec((BR * S, ac.shape[1]),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))
        tail = acts

    out_shapes, out_specs = [], []
    if a0.need_dx:
        out_shapes.append(jax.ShapeDtypeStruct((N, x.shape[1]), jnp.float32))
        out_specs.append(pl.BlockSpec((BR * S, x.shape[1]), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    ct = ct_code.shape[-1] if ct_code is not None else 0
    cd = cd_code.shape[-1] if cd_code is not None else 0
    if ct:
        out_shapes.append(jax.ShapeDtypeStruct((R, 1, ct), jnp.float32))
        out_specs.append(pl.BlockSpec((BR, 1, ct), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    if cd:
        out_shapes.append(jax.ShapeDtypeStruct((R, 1, cd), jnp.float32))
        out_specs.append(pl.BlockSpec((BR, 1, cd), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    if a0.emb:
        FC2 = a0.emb_F * 2 * a0.emb_C
        out_shapes.append(jax.ShapeDtypeStruct((1, FC2), jnp.float32))
        out_specs.append(pl.BlockSpec((1, FC2), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    out_specs += _w_specs(weights)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, archs, cdt, stash),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=_interpret(),
    )(*args, *_cast_kernels(weights, cdt), *tail)

    oi = 0
    if a0.need_dx:
        dx = outs[oi][:n]; oi += 1
    else:
        dx = jnp.zeros_like(x)
    dct = dcd = dwin = None
    if ct:
        dct = outs[oi].reshape(-1, ct)[:ct_code.shape[0]]; oi += 1
    if cd:
        dcd = outs[oi].reshape(-1, cd)[:cd_code.shape[0]]; oi += 1
    if a0.emb:
        dwin = outs[oi]; oi += 1
    dws = tuple(outs[oi:])
    return dx, dct, dcd, dwin, dws


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# Block-size policy (swept on v5e, tools/bench_fused_mlp.py): narrow
# nets are sequencing-bound — every matmul pays a fixed issue cost, so
# fewer/larger blocks win — while wide nets are VMEM-bound in the
# backward (rematerialized activation stack): W>=256 fails to compile
# beyond 768 points/block. Backward blocks are powers of two: a
# power-of-two per-block ray count divides the recipe's 2048 rays,
# where a 768-pt block (6 rays) forces a 2048->2052 ray pad + result
# slice outside the kernel (r4 sweep: trunk bpb 512 beats 768 by
# ~0.8 ms/step at the recipe bundle for exactly this reason, and
# non-divisible 768 is also the worst case for feat/skin).
def _block_policy(W, any_code):
    # bp=2048 for narrow nets too: the r4 sweep shows fwd time RISES past
    # 2048 (vis 0.98 ms @2048 vs 1.43 @3072 — double-buffer DMA stops
    # overlapping once the block exceeds ~0.5 MB input)
    bp = 2048
    if _stash():
        # stash route: the fwd also holds the [bp, sum(act widths)] output
        # block (~2.6k cdt features for the trunk) — shrink to fit VMEM
        bp = 512 if W >= 256 else 1024
    if W >= 256:
        bpb = 512  # 1024 exceeds VMEM (remat stack)
    elif W > 64 or any_code:
        bpb = 1024  # W=128 @ 2048 pts: 17.2M > 16M VMEM
    else:
        bpb = 2048
    return bp, bpb


def _prep_embed(x2, embed_freqs, embed_logscale, embed_window):
    if embed_freqs > 0:
        # x arrives RAW [.., C]; the positional embed to C*(2F+1) channels
        # runs inside the kernel (dx comes back [.., C] directly)
        C = x2.shape[-1]
        in_x = C * (2 * embed_freqs + 1)
        emb = (C, embed_freqs, embed_logscale)
        if embed_window is None:
            win = jnp.ones((1, embed_freqs * 2 * C), jnp.float32)
        else:
            win = embed_window.reshape(1, -1).astype(jnp.float32)
        return in_x, emb, win
    return x2.shape[-1], None, None


def nerf_mlp_pallas(params: dict, x: jnp.ndarray, *, D: int, in_xyz: int,
                    in_dir: int, skips: Sequence[int] = (4,),
                    raw_feat: bool, sigma_only: bool = False,
                    code_trunk: Optional[jnp.ndarray] = None,
                    code_dir: Optional[jnp.ndarray] = None,
                    samples_per_ray: int = 1,
                    need_dx: bool = True,
                    block_points: Optional[int] = None,
                    block_points_bwd: Optional[int] = None,
                    embed_freqs: int = 0, embed_logscale: bool = True,
                    embed_window: Optional[jnp.ndarray] = None,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in for nets.NeRFMLP.apply on TPU (training hot path).

    params: the flax param dict of one NeRFMLP. x: [..., C] per-point
    inputs (embedded xyz; may also carry the concatenated codes exactly
    like the flax call — they are split out below). code_trunk [R, ct]:
    per-ray features appended to the trunk input inside the kernel
    (in_channels_xyz of the flax module = x width + ct). code_dir
    [R, cd]: per-ray dir-branch features (in_channels_dir = cd).
    samples_per_ray: S such that x rows = R*S in ray-major order.
    Matches NeRFMLP.__call__ semantics (nets.py:50-73).
    """
    weights = flatten_params(params, D)
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, x.shape[-1])
    S = samples_per_ray
    ct = code_trunk.shape[-1] if code_trunk is not None else 0
    cd = code_dir.shape[-1] if code_dir is not None else 0
    if code_trunk is not None:
        code_trunk = code_trunk.reshape(-1, ct)
    if code_dir is not None:
        code_dir = code_dir.reshape(-1, cd)
    if code_dir is None and in_dir > 0:
        # legacy layout: dir columns concatenated into x (per point)
        assert ct == 0 and S == 1, "per-point dir input needs S=1"
        code_dir = x2[:, in_xyz:in_xyz + in_dir]
        x2 = x2[:, :in_xyz]
        cd = in_dir
    in_x, emb, win = _prep_embed(x2, embed_freqs, embed_logscale,
                                 embed_window)
    assert in_x + ct == in_xyz, \
        f"x width {in_x} + code_trunk {ct} != in_channels_xyz {in_xyz}"
    assert cd == in_dir, f"code_dir width {cd} != in_channels_dir {in_dir}"
    use_sigmoid = not raw_feat and not sigma_only
    drop_sigma = raw_feat and not sigma_only
    arch = Arch(D, in_x, ct, cd, tuple(skips), S, need_dx=need_dx,
                sigmoid=use_sigmoid, emb=emb, drop_sigma=drop_sigma)
    W = weights[0].shape[1]
    dbp, dbpb = _block_policy(W, bool(ct or cd))
    block_points = block_points if block_points is not None else dbp
    if block_points_bwd is None:
        block_points_bwd = dbpb
    npts = max(n, 1)
    bp = min(block_points, max(S, 256, 1 << (npts - 1).bit_length()))
    BR = max(1, bp // S)
    BRb = max(1, min(block_points_bwd, bp) // S)
    (out,) = fused_mlp(x2, code_trunk, code_dir, win, weights, (arch,), BR,
                       BRb, compute_dtype)
    out_ch = weights[-2].shape[1]
    if sigma_only:
        return out[:, out_ch:].reshape(lead + (1,))
    if raw_feat:
        return out.reshape(lead + (out_ch,))  # kernel emitted rgb only
    return out.reshape(lead + (out_ch + 1,))


def nerf_mlp_pallas_multi(nets, x, *,
                          code_trunk: Optional[jnp.ndarray] = None,
                          code_dir: Optional[jnp.ndarray] = None,
                          samples_per_ray: int = 1,
                          need_dx: bool = True,
                          block_points: Optional[int] = None,
                          block_points_bwd: Optional[int] = None,
                          embed_freqs: int = 0, embed_logscale: bool = True,
                          embed_window: Optional[jnp.ndarray] = None,
                          compute_dtype=jnp.bfloat16):
    """Evaluate SEVERAL NeRFMLPs on the same per-point input in one fused
    launch (one block DMA + one in-kernel embed + one grid sequencing).

    nets: list of dicts with keys
      params, D, in_xyz, in_dir, skips, raw_feat,
      use_ct (net consumes the shared code_trunk operand),
      use_cd (net consumes the shared code_dir operand).
    Returns a list of per-net outputs shaped like nerf_mlp_pallas's.
    """
    lead = x.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(n, x.shape[-1])
    S = samples_per_ray
    ct = code_trunk.shape[-1] if code_trunk is not None else 0
    cd = code_dir.shape[-1] if code_dir is not None else 0
    if code_trunk is not None:
        code_trunk = code_trunk.reshape(-1, ct)
    if code_dir is not None:
        code_dir = code_dir.reshape(-1, cd)
    in_x, emb, win = _prep_embed(x2, embed_freqs, embed_logscale,
                                 embed_window)
    archs, weights = [], []
    for spec in nets:
        use_ct = bool(spec.get("use_ct")) and ct > 0
        use_cd = bool(spec.get("use_cd")) and cd > 0
        ct_i = ct if use_ct else 0
        cd_i = cd if use_cd else 0
        assert in_x + ct_i == spec["in_xyz"], \
            f"x width {in_x} + ct {ct_i} != in_channels_xyz {spec['in_xyz']}"
        assert cd_i == spec["in_dir"], \
            f"code_dir width {cd_i} != in_channels_dir {spec['in_dir']}"
        raw_feat = spec["raw_feat"]
        archs.append(Arch(spec["D"], in_x, ct_i, cd_i,
                          tuple(spec["skips"]), S, need_dx=need_dx,
                          sigmoid=not raw_feat, emb=emb,
                          drop_sigma=raw_feat))
        weights.extend(flatten_params(spec["params"], spec["D"]))
    weights = tuple(weights)
    # block policy keyed on the WIDEST net: its remat stack dominates VMEM
    Wmax = max(w[0].shape[1]
               for w in _split_ws(weights, archs))
    dbp, dbpb = _block_policy(Wmax, bool(ct or cd))
    block_points = block_points if block_points is not None else dbp
    if block_points_bwd is None:
        block_points_bwd = dbpb
    npts = max(n, 1)
    bp = min(block_points, max(S, 256, 1 << (npts - 1).bit_length()))
    BR = max(1, bp // S)
    BRb = max(1, min(block_points_bwd, bp) // S)
    outs = fused_mlp(x2, code_trunk, code_dir, win, weights, tuple(archs),
                     BR, BRb, compute_dtype)
    results = []
    for a, o, w in zip(archs, outs, _split_ws(weights, archs)):
        out_ch = w[-2].shape[1]
        if a.drop_sigma:
            results.append(o.reshape(lead + (out_ch,)))
        else:
            results.append(o.reshape(lead + (out_ch + 1,)))
    return results
