#!/bin/bash
# Full-recipe rehearsal on the articulated synthetic fixture (the role of
# the reference's a-eagle/a-hands sequences: render_synthetic.py +
# run_eval.sh gt_pmat=canonical): make the dataset, run the 3-stage
# template recipe, extract per-frame meshes, score vs GT meshes.
#
# Usage: bash scripts/eval_synth.sh [seqname] [ep1] [ep2] [ep3]
#   EXTRA_FLAGS env var is appended to every training stage.
set -e
seqname=${1:-a-flap}
ep1=${2:-120}
ep2=${3:-30}
ep3=${4:-120}
batch_size=${BATCH_SIZE:-256}
img_size=${IMG_SIZE:-256}
# SEED env var: PRNG seed for the whole recipe; lognames get a -sN suffix
# so multi-seed studies don't collide (reference fixes seed 0, main.py:31).
seed=${SEED:-0}
seedtag=""
if [ "$seed" != "0" ]; then seedtag="-s$seed"; fi

if [ ! -d database/DAVIS/JPEGImages/Full-Resolution/$seqname ]; then
  python tools/make_synth_dataset.py --out database/DAVIS --seqname $seqname \
      --scene mesh --img_size $img_size --num_frames 48 --lines
fi

model_prefix=$seqname-e$ep1-b$batch_size$seedtag
# GT cameras as fixed priors (use_cam: root MLP learns so3/trans deltas on
# them, moda.py:1430-1443) — the known-camera route for synthetic-GT data;
# free-camera optimization on monocular footage has a scale gauge freedom
# that needs the posenet+real-video regime to stay pinned.
common="--seqname $seqname --lineload --batch_size $batch_size \
  --img_size $img_size --nouse_human --nosymm_shape --use_rtk_file --use_cam \
  --seed $seed ${EXTRA_FLAGS:-}"

# stage 1: init (GT-camera init standing in for the posenet route)
savename=${model_prefix}-init
python -m moda_tpu.cli.train_app $common --logname $savename \
  --num_epochs $ep1 --warmup_shape_ep 5 --warmup_rootmlp \
  --eikonal_wt 0.001 --nsample 4 --noppr_eikonal

# stage 2: pose correction
loadname=$savename
savename=${model_prefix}-ft1
python -m moda_tpu.cli.train_app $common --logname $savename \
  --num_epochs $ep2 --model_path logdir/$loadname/latest \
  --warmup_steps 0 --nf_reset 1 --bound_reset 1 \
  --dskin_steps 0 --fine_steps 1 --noanneal_freq \
  --freeze_proj --proj_end 1

# stage 3: fine-tune with active + fine samples
loadname=$savename
savename=${model_prefix}-ft2
python -m moda_tpu.cli.train_app $common --logname $savename \
  --num_epochs $ep3 --model_path logdir/$loadname/latest \
  --warmup_steps 0 --nf_reset 0 --bound_reset 0 \
  --dskin_steps 0 --fine_steps 0 --noanneal_freq \
  --freeze_root --use_unc --img_wt 1 --reset_beta \
  --eikonal_wt 0.1 --nsample 4 --noppr_eikonal

# extract per-frame meshes + cams + renders
python -m moda_tpu.cli.extract_app --seqname $seqname --logname $savename \
  --model_path logdir/$savename/latest --lineload --img_size $img_size \
  --nouse_human --nosymm_shape --test_frames '{0}' --sample_grid3d 128

# AMA-protocol score vs the GT meshes
bash scripts/eval_ama.sh logdir/$savename-export \
  database/DAVIS/Meshes/Full-Resolution/$seqname | tee logdir/$savename-eval.json

# root-pose accuracy vs GT cameras (eval_root protocol)
n=$(ls database/DAVIS/Cameras/Full-Resolution/$seqname | wc -l)
python -m moda_tpu.cli.eval_root_app logdir/$savename-export/$seqname-cam \
  database/DAVIS/Cameras/Full-Resolution/$seqname $((n-1)) \
  | tee logdir/$savename-rooteval.json
