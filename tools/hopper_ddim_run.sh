#!/bin/bash
# Hopper DPPO with DDIM sampling (K=20 -> DDIM 10, ft 5) — exercises the
# DDIM + eta code path at scale (50 iters). Reuses the hopper longrun's
# demos and BC checkpoint if present.
set -e
R=/root/repo/runs/hopper
test -f $R/pre/checkpoint/state_200.pkl || { echo "run tools/hopper_longrun.sh first"; exit 1; }
cd /root/repo
python -m dppo_tpu.run --config cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml \
  logdir=$R/ft_ddim base_policy_path=$R/pre/checkpoint/state_200.pkl \
  normalization_path=$R/normalization.npz \
  env.backend=batched_mujoco \
  model.use_ddim=True model.ddim_steps=10 \
  ft_denoising_steps=5 model.ft_denoising_steps=5 \
  train.n_train_itr=50 train.save_model_freq=50 train.val_freq=20
echo DDIM_DONE
