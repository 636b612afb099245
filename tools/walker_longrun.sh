#!/bin/bash
# Walker2d DPPO evidence run: demos -> BC pretrain -> finetune at
# the reference operating point (40 envs x 500 steps x act 4, K=20, ft 10).
# ITERS overrides the finetune iteration budget (default 300).
set -e
ITERS=${ITERS:-300}
R=/root/repo/runs/walker2d
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("walker2d-medium-v2", "/root/repo/runs/walker2d/train.npz",
                  "/root/repo/runs/walker2d/normalization.npz",
                  n_episodes=50, max_steps=500)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/pretrain/walker2d-medium-v2/pre_diffusion_mlp.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
python -m dppo_tpu.run --config cfg/gym/finetune/walker2d-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  train.n_train_itr=$ITERS train.save_model_freq=25 train.val_freq=25
echo WALKER_DONE
