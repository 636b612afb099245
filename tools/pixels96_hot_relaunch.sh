#!/bin/bash
# Fresh 96x96 pixel campaign on the post-SpatialEmb-fix code: re-pretrain
# the K=100 BC (old checkpoints carry the pre-fix SpatialEmb tree) and run
# the hot finetune (actor_lr 1e-4, grad_accumulate 4, 128 envs).
set -e
R=/root/repo/runs/pendulum_pixels96
cd /root/repo
nice -n 10 python -m dppo_tpu.run --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml \
  logdir=$R/pre2 train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
nice -n 10 python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img_96.yaml \
  logdir=$R/ft_hot2 base_policy_path=$R/pre2/checkpoint/state_200.pkl \
  env.n_envs=128 \
  train.n_train_itr=${ITERS:-1200} train.save_model_freq=100 train.val_freq=25 \
  train.actor_lr=1e-4 train.actor_lr_scheduler.min_lr=1e-4 \
  train.actor_lr_scheduler.first_cycle_steps=${ITERS:-1200} \
  train.critic_lr_scheduler.first_cycle_steps=${ITERS:-1200} \
  train.grad_accumulate=4
echo PIXELS96_HOT2_DONE
