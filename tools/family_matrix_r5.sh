#!/bin/bash
# Round-5 learning-evidence matrix (VERDICT r4 #2): one fused-device run per
# still-unevidenced algorithm family, all on Pendulum at a fixed budget,
# from the shared BC checkpoint (artifacts/pendulum/pre_state_200.pkl)
# where the family fine-tunes a diffusion policy. Success criterion:
# framework success_rate (best chunk reward / act_steps >= -0.1) at the
# final eval, or a documented algorithm ceiling with the DPPO paper's
# baseline ranking as sanity check.
#
# Families covered: RWR, DIPO, IDQL, QSM, exact-PPO, Gaussian-PPO, GMM-PPO,
# RLPD, IBRL. (DQL, AWR, SAC, Cal-QL, DPPO, DDIM+eta already have r2-r4
# evidence.)
set -u
cd /root/repo
R=/root/repo/runs/matrix
mkdir -p $R
PRE=/root/repo/artifacts/pendulum/pre_state_200.pkl
NORM=/root/repo/artifacts/pendulum/normalization.npz
DATA=/root/repo/artifacts/pendulum/train.npz
ITERS=${ITERS:-300}
TMO=${TMO:-5400}

run() { # run <name> <timeout> <args...>
  local name=$1 tmo=$2; shift 2
  if [ -f $R/$name.done ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date) ==="
  timeout "$tmo" nice -n 10 python -m dppo_tpu.run "$@" > $R/$name.log 2>&1
  local rc=$?
  echo "$name rc=$rc $(date)" | tee $R/$name.done
  tail -2 $R/$name.log
}

# --- BC pretrains for the from-pretrain Gaussian/GMM families ---
run pre_gaussian 1800 \
  --config cfg/gym/pretrain/pendulum-v1/pre_gaussian_mlp.yaml \
  logdir=$R/pre_gaussian train_dataset_path=$DATA \
  train.n_epochs=200 train.save_model_freq=200

run pre_gaussian_ta1 1800 \
  --config cfg/gym/pretrain/pendulum-v1/pre_gaussian_mlp.yaml \
  logdir=$R/pre_gaussian_ta1 train_dataset_path=$DATA \
  horizon_steps=1 model.network.activation_type=Mish \
  model.network.residual_style=false \
  train.n_epochs=200 train.save_model_freq=200

run pre_gmm 1800 \
  --config cfg/gym/pretrain/pendulum-v1/pre_gmm_mlp.yaml \
  logdir=$R/pre_gmm train_dataset_path=$DATA \
  train.n_epochs=200 train.save_model_freq=200

# --- diffusion fine-tuning families (shared diffusion BC checkpoint) ---
run rwr $TMO --config cfg/gym/finetune/pendulum-v1/ft_rwr_diffusion_mlp.yaml \
  logdir=$R/rwr base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=$ITERS

run dipo $TMO --config cfg/gym/finetune/pendulum-v1/ft_dipo_diffusion_mlp.yaml \
  logdir=$R/dipo base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=$ITERS

run idql $TMO --config cfg/gym/finetune/pendulum-v1/ft_idql_diffusion_mlp.yaml \
  logdir=$R/idql base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=$ITERS

run qsm $TMO --config cfg/gym/finetune/pendulum-v1/ft_qsm_diffusion_mlp.yaml \
  logdir=$R/qsm base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=$ITERS

run exact $TMO --config cfg/gym/finetune/pendulum-v1/ft_ppo_exact_diffusion_mlp.yaml \
  logdir=$R/exact base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=$ITERS

# --- Gaussian / GMM PPO from their own BC pretrains ---
run gaussian_ppo $TMO --config cfg/gym/finetune/pendulum-v1/ft_ppo_gaussian_mlp.yaml \
  logdir=$R/gaussian_ppo \
  base_policy_path=$R/pre_gaussian/checkpoint/state_200.pkl \
  normalization_path=$NORM train.n_train_itr=$ITERS

run gmm_ppo $TMO --config cfg/gym/finetune/pendulum-v1/ft_ppo_gmm_mlp.yaml \
  logdir=$R/gmm_ppo \
  base_policy_path=$R/pre_gmm/checkpoint/state_200.pkl \
  normalization_path=$NORM train.n_train_itr=$ITERS

# --- from-scratch / bootstrapped off-policy families ---
run rlpd $TMO --config cfg/gym/scratch/pendulum-v1/rlpd_mlp.yaml \
  logdir=$R/rlpd offline_dataset_path=$DATA normalization_path=$NORM

run ibrl $TMO --config cfg/gym/finetune/pendulum-v1/ibrl_mlp.yaml \
  logdir=$R/ibrl \
  base_policy_path=$R/pre_gaussian_ta1/checkpoint/state_200.pkl \
  normalization_path=$NORM

echo MATRIX_DONE $(date)
