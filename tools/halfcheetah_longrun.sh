#!/bin/bash
# HalfCheetah DPPO evidence run (reference operating point).
# ITERS overrides the finetune iteration budget (default 250).
set -e
ITERS=${ITERS:-250}
R=/root/repo/runs/halfcheetah
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("halfcheetah-medium-v2", "/root/repo/runs/halfcheetah/train.npz",
                  "/root/repo/runs/halfcheetah/normalization.npz",
                  n_episodes=50, max_steps=500)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/pretrain/halfcheetah-medium-v2/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/gym/finetune/halfcheetah-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=$ITERS train.save_model_freq=25 train.val_freq=25
echo CHEETAH_DONE
