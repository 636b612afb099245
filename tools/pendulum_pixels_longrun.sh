#!/bin/bash
# PIXEL DPPO evidence run, fully TPU-resident: random-walk demos with
# frames from the same on-device rasterizer -> VisionDiffusionMLP BC
# pretrain -> fused pixel DPPO finetune where each iteration (render ->
# ViT policy denoising scan -> env step -> PPO update w/ RandomShiftsAug +
# chunked recompute) is ONE XLA dispatch. The proprio obs carries only the
# angular velocity, so learning is evidence the vision stack reads the
# rod's angle from pixels. ITERS overrides the finetune budget.
set -e
ITERS=${ITERS:-300}
R=/root/repo/runs/pendulum_pixels
mkdir -p $R
cd /root/repo
if [ ! -f $R/train.npz ]; then
python - <<'PY'
from dppo_tpu.data.synthetic import collect_pendulum_pixel_demos
collect_pendulum_pixel_demos("/root/repo/runs/pendulum_pixels/train.npz",
                             n_episodes=25, max_steps=200)
print("pixel demos done", flush=True)
PY
fi
if [ ! -f $R/pre/checkpoint/state_200.pkl ]; then
python -m dppo_tpu.run --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
fi
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
echo PIXELS_DONE
