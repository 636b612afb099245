#!/bin/bash
# Long-horizon hopper DPPO evidence run on the real TPU (axon) with the
# batched native env backend. demos -> 200-epoch BC pretrain -> 150-iter
# DPPO finetune at the reference operating point (40 envs x 500 steps x
# act 4, K=20 DDPM, ft last 10).
set -e
R=/root/repo/runs/hopper
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("Hopper-v4", "/root/repo/runs/hopper/train.npz",
                  "/root/repo/runs/hopper/normalization.npz",
                  n_episodes=50, max_steps=500)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/pretrain/hopper-medium-v2/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=150 train.save_model_freq=50 train.val_freq=25
echo LONGRUN_DONE
