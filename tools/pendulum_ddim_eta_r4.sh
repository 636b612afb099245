#!/bin/bash
# Round-4 eta-study completion (VERDICT r3 weak #5 / next #9): the two
# remaining eta modules on-chip at the pendulum DDIM operating point, same
# BC checkpoint as the r3 fixed-eta (96%) and EtaState (72%) arms.
#   (a) EtaAction, base 0.7 (per-action-dim logit; must move toward 1
#       like EtaState did; base < max avoids the atanh saturation pitfall
#       recorded in PROGRESS r3)
#   (b) EtaStateAction at its reference defaults (base 1.0, min 1e-3,
#       max 2.0 — eta.py:122): starts AT the best-known fixed value, so
#       matching the fixed-eta 96% validates that the eta-learning
#       machinery itself costs nothing when initialized well.
set -e
ITERS=${ITERS:-300}
R=/root/repo/runs/pendulum_ddim
PRE=/root/repo/runs/awr_pendulum
test -f $PRE/pre/checkpoint/state_200.pkl || { echo "run tools/awr_pendulum_longrun.sh first"; exit 1; }
cd /root/repo
nice -n 10 python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_ddim.yaml \
  logdir=$R/eta_action base_policy_path=$PRE/pre/checkpoint/state_200.pkl \
  normalization_path=$PRE/normalization.npz \
  model.learn_eta=True model.eta._target_=dppo.model.diffusion.eta.EtaAction \
  model.eta.base_eta=0.7 \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
nice -n 10 python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_ddim.yaml \
  logdir=$R/eta_state_action base_policy_path=$PRE/pre/checkpoint/state_200.pkl \
  normalization_path=$PRE/normalization.npz \
  model.learn_eta=True model.eta._target_=dppo.model.diffusion.eta.EtaStateAction \
  model.eta.base_eta=1.0 model.eta.min_eta=1e-3 model.eta.max_eta=2.0 \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=10
echo DDIM_ETA_R4_DONE
