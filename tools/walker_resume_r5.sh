#!/bin/bash
# Round-5 walker extension (VERDICT r4 #3): resume the full train state at
# the last r4 checkpoint (full_state_425, archived in artifacts/) and drive
# toward the reference's full 1000-iteration budget
# (cfg/gym/finetune/walker2d-v2/ft_ppo_diffusion_mlp.yaml:46) or documented
# saturation (two consecutive 100-iter eval windows within noise).
set -e
R=/root/repo/runs/walker2d
cd /root/repo
if ! ls $R/ft/checkpoint/full_state_*.pkl >/dev/null 2>&1; then
  # restore from the archived artifacts if the scratch disk was wiped
  mkdir -p $R/ft/checkpoint $R/pre/checkpoint
  cp artifacts/walker2d/full_state_*.pkl $R/ft/checkpoint/
  cp artifacts/walker2d/pre_state_200.pkl $R/pre/checkpoint/state_200.pkl
  cp artifacts/walker2d/normalization.npz $R/normalization.npz
fi
LAST=$(ls $R/ft/checkpoint/full_state_*.pkl | sed 's/.*full_state_\([0-9]*\).pkl/\1/' | sort -n | tail -1)
ITERS=${ITERS:-1000}
echo "resuming walker at itr $LAST toward $ITERS"
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/walker2d-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=$ITERS train.save_model_freq=25 train.val_freq=25 \
  train.resume_itr=$LAST
