#!/bin/bash
# Avoid-task DPPO evidence run, fully TPU-resident: the D3IL-style
# obstacle-avoidance device env (dppo_tpu/envs/device/avoid.py) runs as a
# JAX program on the chip and each train iteration (25-chunk rollout + full
# PPO update) is ONE fused XLA dispatch. scripted expert demos -> BC
# pretrain -> 200-iter DPPO finetune (50 device envs, K=20 DDPM, ft 10).
set -e
R=/root/repo/runs/avoid
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.envs.device import collect_avoid_demos
collect_avoid_demos("/root/repo/runs/avoid/train.npz",
                    "/root/repo/runs/avoid/normalization.npz",
                    n_episodes=48, max_steps=120)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/d3il/pretrain/avoid_device/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/d3il/finetune/avoid_device/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  train.n_train_itr=200 train.save_model_freq=100 train.val_freq=20
echo AVOID_DONE
