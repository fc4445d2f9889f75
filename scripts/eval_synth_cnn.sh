#!/bin/bash
# Cold-start rehearsal: the full 3-stage recipe on the synthetic fixture
# through the reference's ACTUAL no-prior route — warmup_pose trains the
# pose CNN on rasterized prior-mesh features, extract_cams_cnn initializes
# per-frame cameras from observed CSE features with OOD filtering
# (train_utils.py:871-921,393-453) — instead of GT rtk priors. Stages 2/3
# mirror eval_synth.sh (the template.sh recipe) minus the GT-camera flags.
# Scores root-pose accuracy vs the GT cameras (eval_root protocol) and
# mesh chamfer after stage 1 and after stage 3, for comparison against
# the GT-prior run of eval_synth.sh.
#
# Usage: bash scripts/eval_synth_cnn.sh [seqname] [ep1] [ep2] [ep3]
#   ep2/ep3 = 0 skips that stage (stage-1-only rehearsal).
set -e
seqname=${1:-a-flap}
ep1=${2:-120}
ep2=${3:-30}
ep3=${4:-120}
batch_size=${BATCH_SIZE:-256}
img_size=${IMG_SIZE:-256}

if [ ! -d database/DAVIS/JPEGImages/Full-Resolution/$seqname ]; then
  python tools/make_synth_dataset.py --out database/DAVIS --seqname $seqname \
      --scene mesh --img_size $img_size --num_frames 48 --lines
fi

score () {
  local savename=$1
  python -m moda_tpu.cli.extract_app --seqname $seqname --logname $savename \
    --model_path logdir/$savename/latest --lineload --img_size $img_size \
    --nouse_human --nosymm_shape --test_frames '{0}' --sample_grid3d 128
  bash scripts/eval_ama.sh logdir/$savename-export \
    database/DAVIS/Meshes/Full-Resolution/$seqname \
    | tee logdir/$savename-eval.json
  local n
  n=$(ls database/DAVIS/Cameras/Full-Resolution/$seqname | wc -l)
  python -m moda_tpu.cli.eval_root_app logdir/$savename-export/$seqname-cam \
    database/DAVIS/Cameras/Full-Resolution/$seqname $((n-1)) \
    | tee logdir/$savename-rooteval.json
}

prior=database/DAVIS/Densepose/Full-Resolution/$seqname/prior.pkl
priorflag=""
if [ -f "$prior" ]; then priorflag="--prior_mesh_path $prior"; fi

common="--seqname $seqname --lineload --batch_size $batch_size \
  --img_size $img_size --nouse_human --nosymm_shape $priorflag ${EXTRA_FLAGS:-}"

# stage 1: init — no --use_rtk_file / --use_cam: cameras come from the
# pose-CNN route (warmup_pose + extract_cams_cnn + warmup_rootmlp preset)
savename=$seqname-cnn-init
python -m moda_tpu.cli.train_app $common --logname $savename \
  --num_epochs $ep1 \
  --warmup_shape_ep 5 --warmup_pose_ep 10 --warmup_rootmlp \
  --eikonal_wt 0.001 --nsample 4 --noppr_eikonal
score $savename

# stage 2: pose correction (template.sh stage 2 flags)
if [ "$ep2" -gt 0 ]; then
  loadname=$savename
  savename=$seqname-cnn-ft1
  python -m moda_tpu.cli.train_app $common --logname $savename \
    --num_epochs $ep2 --model_path logdir/$loadname/latest \
    --warmup_steps 0 --nf_reset 1 --bound_reset 1 \
    --dskin_steps 0 --fine_steps 1 --noanneal_freq \
    --freeze_proj --proj_end 1
fi

# stage 3: fine-tune with active + fine samples (template.sh stage 3 flags)
if [ "$ep3" -gt 0 ]; then
  loadname=$savename
  savename=$seqname-cnn-ft2
  python -m moda_tpu.cli.train_app $common --logname $savename \
    --num_epochs $ep3 --model_path logdir/$loadname/latest \
    --warmup_steps 0 --nf_reset 0 --bound_reset 0 \
    --dskin_steps 0 --fine_steps 0 --noanneal_freq \
    --freeze_root --use_unc --img_wt 1 --reset_beta \
    --eikonal_wt 0.1 --nsample 4 --noppr_eikonal
  score $savename
fi
