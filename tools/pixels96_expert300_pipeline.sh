#!/bin/bash
# Round-5 pixel arm 2: same expert-regime pipeline as
# tools/pixels96_expert_pipeline.sh but with 3x the expert demonstrations
# (300 episodes / 60k frames — the reference's robomimic recipes use 300
# demos per task, cfg .../pre_diffusion_mlp_img.yaml max_n_episodes). Arm 1
# (100 episodes) showed the BC start is data-limited: BC evals 34% DDPM-100
# / 3% DDIM-5 and the finetune grinds in the 25-40% band.
set -e
R=/root/repo/runs/pixels96_expert300
ITERS=${ITERS:-600}
cd /root/repo
test -f $R/train.npz || { echo "run tools/distill_pixel_expert.py --episodes 300 --out $R first"; exit 1; }

if ! ls $R/pre/checkpoint/state_*.pkl >/dev/null 2>&1; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml \
    logdir=$R/pre train_dataset_path=$R/train.npz \
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
      logdir=$R/bc_eval_$sampler base_policy_path=$PRE $EXTRA \
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
  train.n_train_itr=$ITERS train.save_model_freq=50 train.val_freq=25 \
  $RESUME
