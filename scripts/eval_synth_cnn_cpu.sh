#!/bin/bash
# Reduced-scale CPU rehearsal of the cold-start (pose-CNN) route, for
# when no accelerator is available: same pipeline as eval_synth_cnn.sh
# (warmup_pose -> extract_cams_cnn -> stage-1 -> extract -> AMA + root
# eval) on a smaller fixture. Produces logdir/<seq>-cnn-init-{eval,
# rooteval}.json like the full-scale script.
#
# Usage: bash scripts/eval_synth_cnn_cpu.sh [seqname] [ep1] [img] [frames] [batch]
set -e
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS
seqname=${1:-a-flap128}
ep1=${2:-20}
img_size=${3:-128}
frames=${4:-24}
batch_size=${5:-32}

if [ ! -d database/DAVIS/JPEGImages/Full-Resolution/$seqname ]; then
  python tools/make_synth_dataset.py --out database/DAVIS --seqname $seqname \
      --scene mesh --img_size $img_size --num_frames $frames --lines
fi

savename=$seqname-cnn-init
# no --use_rtk_file / --use_cam: cameras start from the pose-CNN route
python -m moda_tpu.cli.train_app --seqname $seqname --lineload \
  --batch_size $batch_size --img_size $img_size --nouse_human \
  --nosymm_shape --logname $savename --num_epochs $ep1 \
  --warmup_shape_ep 3 --warmup_pose_ep 5 --warmup_rootmlp \
  --eikonal_wt 0.001 --nsample 4 --ndepth 64 --noppr_eikonal \
  --sample_grid3d 96 ${EXTRA_FLAGS:-}

python -m moda_tpu.cli.extract_app --seqname $seqname --logname $savename \
  --model_path logdir/$savename/latest --lineload --img_size $img_size \
  --nouse_human --nosymm_shape --test_frames '{0}' --sample_grid3d 96

bash scripts/eval_ama.sh logdir/$savename-export \
  database/DAVIS/Meshes/Full-Resolution/$seqname \
  | tee logdir/$savename-eval.json

n=$(ls database/DAVIS/Cameras/Full-Resolution/$seqname | wc -l)
python -m moda_tpu.cli.eval_root_app logdir/$savename-export/$seqname-cam \
  database/DAVIS/Cameras/Full-Resolution/$seqname $((n-1)) \
  | tee logdir/$savename-rooteval.json
echo CNN_CPU_DONE
