#!/bin/bash
# Fused-AWR evidence run on the TPU-resident Pendulum env: demos -> BC
# pretrain -> 300-iter AWR fine-tune where each train iteration (50
# macro-steps + FIFO-window insert + TD(lambda) + weighted-regression
# updates) is ONE XLA dispatch (dppo_tpu/agents/finetune_awr_device.py).
set -e
R=/root/repo/runs/awr_pendulum
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("pendulum-v1", "/root/repo/runs/awr_pendulum/train.npz",
                  "/root/repo/runs/awr_pendulum/normalization.npz",
                  n_episodes=50, max_steps=200)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_awr_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  train.n_train_itr=300 train.save_model_freq=100 train.val_freq=25
echo LONGRUN_DONE
