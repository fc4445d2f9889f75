#!/bin/bash
# Cold-start rehearsal: stage-1 on the synthetic fixture through the
# reference's ACTUAL no-prior route — warmup_pose trains the pose CNN on
# rasterized prior-mesh features, extract_cams_cnn initializes per-frame
# cameras from observed CSE features with OOD filtering
# (train_utils.py:871-921,393-453) — instead of GT rtk priors.
# Scores root-pose accuracy vs the GT cameras (eval_root protocol) and
# mesh chamfer, for comparison against the GT-prior run of eval_synth.sh.
#
# Usage: bash scripts/eval_synth_cnn.sh [seqname] [ep1]
set -e
seqname=${1:-a-flap}
ep1=${2:-120}
batch_size=${BATCH_SIZE:-256}
img_size=${IMG_SIZE:-256}

if [ ! -d database/DAVIS/JPEGImages/Full-Resolution/$seqname ]; then
  python tools/make_synth_dataset.py --out database/DAVIS --seqname $seqname \
      --scene mesh --img_size $img_size --num_frames 48 --lines
fi

savename=$seqname-cnn-init
# no --use_rtk_file / --use_cam: cameras start from the pose-CNN route
python -m moda_tpu.cli.train_app --seqname $seqname --lineload \
  --batch_size $batch_size --img_size $img_size --nouse_human \
  --nosymm_shape --logname $savename --num_epochs $ep1 \
  --warmup_shape_ep 5 --warmup_pose_ep 10 --warmup_rootmlp \
  --eikonal_wt 0.001 --nsample 4 --noppr_eikonal ${EXTRA_FLAGS:-}

python -m moda_tpu.cli.extract_app --seqname $seqname --logname $savename \
  --model_path logdir/$savename/latest --lineload --img_size $img_size \
  --nouse_human --nosymm_shape --test_frames '{0}' --sample_grid3d 128

bash scripts/eval_ama.sh logdir/$savename-export \
  database/DAVIS/Meshes/Full-Resolution/$seqname \
  | tee logdir/$savename-eval.json

n=$(ls database/DAVIS/Cameras/Full-Resolution/$seqname | wc -l)
python -m moda_tpu.cli.eval_root_app logdir/$savename-export/$seqname-cam \
  database/DAVIS/Cameras/Full-Resolution/$seqname $((n-1)) \
  | tee logdir/$savename-rooteval.json
