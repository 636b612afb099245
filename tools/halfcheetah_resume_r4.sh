#!/bin/bash
# Round-4 halfcheetah extension: resume the full train state at itr 400 and
# run out the reference's full 1000-iteration budget
# (/root/reference/dppo/cfg/gym/finetune/halfcheetah-v2/ft_ppo_diffusion_mlp.yaml:46).
set -e
R=/root/repo/runs/halfcheetah
cd /root/repo
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/halfcheetah-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=1000 train.save_model_freq=25 train.val_freq=25 \
  train.resume_itr=400
