#!/bin/bash
# PIXEL DPPO evidence run, fully TPU-resident: the pendulum renders its
# 48x48 frames on the chip and the whole iteration (render -> ViT policy
# denoising scan -> env step -> PPO update w/ RandomShiftsAug + chunked
# recompute) is ONE fused XLA dispatch. From scratch (no BC checkpoint):
# the proprio obs carries only the angular velocity, so any learning is
# evidence the vision stack reads the rod's angle from pixels.
# ITERS overrides the iteration budget (default 300).
set -e
ITERS=${ITERS:-300}
R=/root/repo/runs/pendulum_pixels
mkdir -p $R
cd /root/repo
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img.yaml \
  logdir=$R/ft \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
echo PIXELS_DONE
