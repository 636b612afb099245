#!/bin/bash
# Pendulum DPPO evidence run with the TPU-RESIDENT env backend: the env is
# a JAX program on the chip and each train iteration (50-macro-step rollout
# + full PPO update) is ONE fused XLA dispatch. demos -> BC pretrain ->
# 300-iter DPPO finetune (128 device envs, K=10 DDPM, ft last 5).
set -e
R=/root/repo/runs/pendulum
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("pendulum-v1", "/root/repo/runs/pendulum/train.npz",
                  "/root/repo/runs/pendulum/normalization.npz",
                  n_episodes=50, max_steps=200)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  train.n_train_itr=300 train.save_model_freq=100 train.val_freq=25
echo LONGRUN_DONE
