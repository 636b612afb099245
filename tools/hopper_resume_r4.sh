#!/bin/bash
# Round-4 hopper extension (VERDICT r3 next #8): resume the full train state
# at the last r3 checkpoint and extend past 150 iterations.
set -e
R=/root/repo/runs/hopper
cd /root/repo
LAST=$(ls $R/ft/checkpoint/full_state_*.pkl | sed 's/.*full_state_\([0-9]*\).pkl/\1/' | sort -n | tail -1)
ITERS=${ITERS:-300}
echo "resuming hopper at itr $LAST toward $ITERS"
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=$ITERS train.save_model_freq=25 train.val_freq=25 \
  train.resume_itr=$LAST
