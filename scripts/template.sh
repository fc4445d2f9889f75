#!/bin/bash
# 3-stage training recipe (TPU edition of the reference scripts/template.sh):
#   stage 1 (init): shape warmup + full optimization with eikonal
#   stage 2 (ft1):  pose correction with projection loss, frozen shape
#   stage 3 (ft2):  fine samples + active sampling + strong rgb loss
# Usage: bash scripts/template.sh <seqname> [use_human] [use_symm]
set -e
seqname=$1
use_human=${2:-no}
use_symm=${3:-no}
num_epochs=120
batch_size=256

model_prefix=$seqname-e$num_epochs-b$batch_size
human_flag=$([ "$use_human" = "yes" ] && echo "--use_human" || echo "--nouse_human")
symm_flag=$([ "$use_symm" = "yes" ] && echo "--symm_shape" || echo "--nosymm_shape")

# stage 1: init
savename=${model_prefix}-init
python -m moda_tpu.cli.train_app --seqname $seqname --logname $savename \
  --num_epochs $num_epochs --lineload --batch_size $batch_size \
  --warmup_shape_ep 5 --warmup_rootmlp \
  $symm_flag $human_flag \
  --eikonal_wt 0.001 --nsample 4 --noppr_eikonal

# stage 2: pose correction
loadname=$savename
savename=${model_prefix}-ft1
python -m moda_tpu.cli.train_app --seqname $seqname --logname $savename \
  --num_epochs $((num_epochs/4)) --lineload --batch_size $batch_size \
  --model_path logdir/$loadname/latest \
  --warmup_steps 0 --nf_reset 1 --bound_reset 1 \
  --dskin_steps 0 --fine_steps 1 --noanneal_freq \
  --freeze_proj --proj_end 1 \
  $symm_flag $human_flag

# stage 3: fine-tune with active + fine samples
loadname=$savename
savename=${model_prefix}-ft2
python -m moda_tpu.cli.train_app --seqname $seqname --logname $savename \
  --num_epochs $num_epochs --lineload --batch_size $batch_size \
  --model_path logdir/$loadname/latest \
  --warmup_steps 0 --nf_reset 0 --bound_reset 0 \
  --dskin_steps 0 --fine_steps 0 --noanneal_freq \
  --freeze_root --use_unc --img_wt 1 --reset_beta \
  $symm_flag $human_flag \
  --eikonal_wt 0.1 --nsample 4 --noppr_eikonal
