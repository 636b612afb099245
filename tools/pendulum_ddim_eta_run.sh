#!/bin/bash
# DDIM + learnable-eta evidence (VERDICT round-2 item 5): two fused-device
# pendulum DPPO runs on the DDIM path from the same BC checkpoint —
# (a) fixed eta=1, (b) learnable state-conditioned eta (EtaState) — to
# show eta moves during training and the curve matches/improves. Reuses
# runs/awr_pendulum's demos + pretrain ckpt (same operating point).
set -e
ITERS=${ITERS:-300}
R=/root/repo/runs/pendulum_ddim
PRE=/root/repo/runs/awr_pendulum
test -f $PRE/pre/checkpoint/state_200.pkl || { echo "run tools/awr_pendulum_longrun.sh first"; exit 1; }
mkdir -p $R
cd /root/repo
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_ddim.yaml \
  logdir=$R/fixed base_policy_path=$PRE/pre/checkpoint/state_200.pkl \
  normalization_path=$PRE/normalization.npz \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_ddim.yaml \
  logdir=$R/learn_eta base_policy_path=$PRE/pre/checkpoint/state_200.pkl \
  normalization_path=$PRE/normalization.npz \
  model.learn_eta=True model.eta._target_=dppo.model.diffusion.eta.EtaState \
  model.eta.base_eta=1.0 \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
echo DDIM_ETA_DONE
