#!/bin/bash
# Round-5 matrix extensions: after the 300-iter family matrix, (a) give the
# slow-but-learning families the larger budget the DPPO paper's ranking
# predicts they need (RWR documented ceiling, DIPO solves late, exact-PPO
# learns slowly at the reference's conservative actor_lr 1e-5), and (b)
# complete the eta matrix's missing cell: EtaState re-run at base_eta 1.0
# (VERDICT r4 #7; r4 evidence: EtaStateAction@1.0 -> 94% vs fixed-eta 96%).
set -u
cd /root/repo
R=/root/repo/runs/matrix
PRE=/root/repo/artifacts/pendulum/pre_state_200.pkl
NORM=/root/repo/artifacts/pendulum/normalization.npz

# wait for the 300-iter matrix to finish (its driver writes ibrl.done last)
while [ ! -f $R/ibrl.done ]; do sleep 60; done

run() {
  local name=$1 tmo=$2; shift 2
  if [ -f $R/$name.done ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date) ==="
  timeout "$tmo" nice -n 10 python -m dppo_tpu.run "$@" > $R/$name.log 2>&1
  echo "$name rc=$? $(date)" | tee $R/$name.done
  tail -2 $R/$name.log
}

run rwr_1000 10800 --config cfg/gym/finetune/pendulum-v1/ft_rwr_diffusion_mlp.yaml \
  logdir=$R/rwr_1000 base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=1000

run dipo_1000 10800 --config cfg/gym/finetune/pendulum-v1/ft_dipo_diffusion_mlp.yaml \
  logdir=$R/dipo_1000 base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=1000

run exact_1000 10800 --config cfg/gym/finetune/pendulum-v1/ft_ppo_exact_diffusion_mlp.yaml \
  logdir=$R/exact_1000 base_policy_path=$PRE normalization_path=$NORM \
  train.n_train_itr=1000

# --- eta matrix completion: EtaState at base 1.0, same budget as the
# other eta arms (300 iters from the shared BC checkpoint) ---
if [ ! -f /root/repo/runs/eta_state1.done ]; then
  echo "=== eta_state1: $(date) ==="
  timeout 7200 nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_ddim.yaml \
    logdir=/root/repo/runs/pendulum_ddim/eta_state1 base_policy_path=$PRE \
    normalization_path=$NORM \
    model.learn_eta=True model.eta._target_=dppo.model.diffusion.eta.EtaState \
    model.eta.base_eta=1.0 \
    train.n_train_itr=300 train.save_model_freq=100 train.val_freq=10 \
    > /root/repo/runs/pendulum_ddim_eta_state1.log 2>&1
  echo "eta_state1 rc=$? $(date)" | tee /root/repo/runs/eta_state1.done
  tail -2 /root/repo/runs/pendulum_ddim_eta_state1.log
fi

echo MATRIX_EXT_DONE $(date)
