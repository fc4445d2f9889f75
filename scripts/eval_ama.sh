#!/bin/bash
# AMA quantitative eval (reference scripts/eval/run_eval.sh role):
# chamfer + f-score of extracted meshes vs GT meshes.
set -e
pred_dir=$1   # directory of predicted per-frame objs
gt_dir=$2     # directory of GT objs
python - "$pred_dir" "$gt_dir" <<'PY'
import sys, glob, os, json
import numpy as np
from moda_tpu.extract.mesh import Mesh
from moda_tpu.evals.ama import eval_sequence

def load_obj(p):
    vs, fs = [], []
    for line in open(p):
        if line.startswith('v '):
            vs.append([float(x) for x in line.split()[1:4]])
        elif line.startswith('f '):
            fs.append([int(t.split('/')[0]) - 1 for t in line.split()[1:4]])
    return Mesh(np.asarray(vs, np.float32), np.asarray(fs, np.int32))

preds = sorted(glob.glob(os.path.join(sys.argv[1], '*mesh-0*.obj')))
gts = sorted(glob.glob(os.path.join(sys.argv[2], '*.obj')))
n = min(len(preds), len(gts))
print(json.dumps(eval_sequence([load_obj(p) for p in preds[:n]],
                               [load_obj(g) for g in gts[:n]]), indent=2))
PY
