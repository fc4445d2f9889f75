#!/bin/bash
# Registration-reproducibility study (VERDICT r4 #2): run the GT-prior
# full recipe at HEAD under multiple PRNG seeds with the round-3/4 flags
# (EXTRA_FLAGS="--clip_scale 500"), then print the rooteval/eval
# distribution. Acceptance: 3/3 runs SO3 median <= 10 deg and F@2% >=
# 0.5x the mc-floor ceiling (logdir/mc-floor-g128.json).
#
# Usage: bash scripts/seed_study.sh [seeds...] (default: 1 2 3)
set -e
seeds=${@:-1 2 3}
for s in $seeds; do
  SEED=$s EXTRA_FLAGS="--clip_scale 500" \
    bash scripts/eval_synth.sh a-flap 120 30 120
done
echo "=== seed study summary ==="
for s in $seeds; do
  tag=""
  if [ "$s" != "0" ]; then tag="-s$s"; fi
  echo "seed $s:"
  python - "$s" "$tag" <<'EOF'
import json, sys
tag = sys.argv[2]
for kind in ("rooteval", "eval"):
    p = f"logdir/a-flap-e120-b256{tag}-ft2-{kind}.json"
    try:
        d = json.load(open(p))
        keep = {k: round(v, 4) for k, v in d.items()
                if isinstance(v, (int, float))}
        print(" ", kind, keep)
    except FileNotFoundError:
        print(" ", kind, "MISSING", p)
EOF
done
