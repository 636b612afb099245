#!/bin/bash
# Round-5 hopper budget item (VERDICT r4 #3): the r3 hopper checkpoints
# predate artifacts/ and died with that round's scratch disk, so the r1/r3
# curve (eval 3061, 100% success at itr 150 — already expert) cannot be
# resumed. Instead, document SATURATION from a fresh run: drive a new
# finetune from the regenerated BC (tools/hopper_prestage.sh) past the
# expert plateau and show consecutive 100-iter eval windows within noise.
set -e
R=/root/repo/runs/hopper
ITERS=${ITERS:-350}
cd /root/repo
test -f $R/pre/checkpoint/state_200.pkl || { echo "run tools/hopper_prestage.sh first"; exit 1; }
RESUME=""
LAST=$(ls $R/ft/checkpoint/full_state_*.pkl 2>/dev/null | sed 's/.*full_state_\([0-9]*\).pkl/\1/' | sort -n | tail -1)
[ -n "$LAST" ] && RESUME="train.resume_itr=$LAST"
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=$ITERS train.save_model_freq=25 train.val_freq=25 \
  $RESUME
