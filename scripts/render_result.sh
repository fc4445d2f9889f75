#!/bin/bash
# Extract meshes + cameras + render turntable gifs for a trained model
# (reference scripts/render_result.sh + render_vids.sh role).
set -e
seqname=$1
logname=$2
python -m moda_tpu.cli.extract_app --seqname $seqname --logname $logname \
  --model_path logdir/$logname/latest --test_frames '{0}' --sample_grid3d 256
