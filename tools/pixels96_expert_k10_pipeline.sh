#!/bin/bash
# Round-5 pixel arm 3: the expert-demo regime at the STATE-PROVEN sampler
# operating point. The state pendulum was solved with K=10 DDPM BC ->
# DDIM-5 fine-tune (cfg .../ft_ppo_diffusion_mlp_ddim.yaml: 96% eval, r3);
# arms 1-2 transplant the reference's robomimic K=100 -> DDIM-5 recipe,
# whose 20x schedule-distillation gap is what the fine-tune spends its
# budget closing (BC evals: 34% under its own DDPM-100 sampler vs 3% under
# DDIM-5). Arm 3 isolates that variable: identical expert demos, identical
# vision stack, K=10 -> DDIM-5 like the solved state arm, hot PPO
# (n_envs 128, actor_lr 1e-4, accum 4 — the r4 "hot" pixel settings).
set -e
R=/root/repo/runs/pixels96_expert_k10
SRC=/root/repo/runs/pixels96_expert300
ITERS=${ITERS:-600}
mkdir -p $R
cd /root/repo
test -f $SRC/train.npz || { echo "need $SRC/train.npz (arm-2 distillation)"; exit 1; }

if ! ls $R/pre/checkpoint/state_*.pkl >/dev/null 2>&1; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml \
    logdir=$R/pre train_dataset_path=$SRC/train.npz \
    denoising_steps=10 \
    train_dataset.max_n_episodes=300 \
    train.n_epochs=1000 train.batch_size=256 train.save_model_freq=500 \
    train.lr_scheduler.first_cycle_steps=1000
fi
PRE=$(ls $R/pre/checkpoint/state_*.pkl | sed 's/.*state_\([0-9]*\).pkl/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
echo "BC pretrain checkpoint: $PRE"

for sampler in ddim ddpm; do
  if [ ! -f $R/bc_eval_$sampler.done ]; then
    EXTRA=""
    [ $sampler = ddpm ] && EXTRA="use_ddim=false"
    nice -n 10 python -m dppo_tpu.run \
      --config cfg/gym/eval/pendulum-v1/eval_diffusion_mlp_img_96.yaml \
      logdir=$R/bc_eval_$sampler base_policy_path=$PRE \
      denoising_steps=10 $EXTRA \
      > $R/bc_eval_$sampler.log 2>&1 && touch $R/bc_eval_$sampler.done
    tail -3 $R/bc_eval_$sampler.log
  fi
done

RESUME=""
LAST=$(ls $R/ft/checkpoint/full_state_*.pkl 2>/dev/null | sed 's/.*full_state_\([0-9]*\).pkl/\1/' | sort -n | tail -1)
[ -n "$LAST" ] && RESUME="train.resume_itr=$LAST"
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img_96.yaml \
  logdir=$R/ft base_policy_path=$PRE \
  denoising_steps=10 \
  env.n_envs=128 \
  train.actor_lr=1e-4 train.actor_lr_scheduler.min_lr=1e-4 \
  train.grad_accumulate=4 \
  train.n_train_itr=$ITERS train.save_model_freq=50 train.val_freq=25 \
  $RESUME
