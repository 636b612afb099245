#!/bin/bash
# Round-5 headline (VERDICT r4 #1): pixel DPPO in the REFERENCE's own
# regime — fine-tune a COMPETENT pixel BC policy instead of a random-walk
# one (the reference's pixel recipes exclusively fine-tune downloaded
# expert BC checkpoints: reference script/run.py:67-78,
# cfg/robomimic/finetune/can/ft_ppo_diffusion_mlp_img.yaml:19-25).
#
#   1. distill: roll out the 96%-success DDIM state policy (r3 artifact),
#      render 96x96 frames with the device-env rasterizer, keep successful
#      episodes -> expert pixel demos
#   2. 96x96 K=100 ViT BC pretrain (1000 epochs, batch 256)
#   3. quote the BC baseline's own eval at the finetune operating point
#      (DDIM-5) so the fine-tuning delta is attributable
#   4. fused pixel DPPO finetune at the reference operating point
#      (K=100 -> DDIM-5, grad_accumulate 15, actor_lr 5e-5)
set -e
R=/root/repo/runs/pixels96_expert
ITERS=${ITERS:-600}
mkdir -p $R
cd /root/repo

if [ ! -f $R/train.npz ]; then
  nice -n 10 python tools/distill_pixel_expert.py --episodes 100 --out $R
fi

if ! ls $R/pre/checkpoint/state_*.pkl >/dev/null 2>&1; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml \
    logdir=$R/pre train_dataset_path=$R/train.npz \
    train.n_epochs=1000 train.batch_size=256 train.save_model_freq=500 \
    train.lr_scheduler.first_cycle_steps=1000
fi
PRE=$(ls $R/pre/checkpoint/state_*.pkl | sed 's/.*state_\([0-9]*\).pkl/\1 &/' | sort -n | tail -1 | cut -d' ' -f2)
echo "BC pretrain checkpoint: $PRE"

# 3) BC baseline eval at the finetune's own operating point (DDIM-5) and
#    at the pretrain sampler (DDPM-100) for reference
if [ ! -f $R/bc_eval_ddim.done ]; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/eval/pendulum-v1/eval_diffusion_mlp_img_96.yaml \
    logdir=$R/bc_eval_ddim base_policy_path=$PRE \
    > $R/bc_eval_ddim.log 2>&1 && touch $R/bc_eval_ddim.done
  tail -3 $R/bc_eval_ddim.log
fi
if [ ! -f $R/bc_eval_ddpm.done ]; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/eval/pendulum-v1/eval_diffusion_mlp_img_96.yaml \
    logdir=$R/bc_eval_ddpm base_policy_path=$PRE use_ddim=false \
    > $R/bc_eval_ddpm.log 2>&1 && touch $R/bc_eval_ddpm.done
  tail -3 $R/bc_eval_ddpm.log
fi

# 4) fused pixel DPPO finetune at the reference operating point
RESUME=""
LAST=$(ls $R/ft/checkpoint/full_state_*.pkl 2>/dev/null | sed 's/.*full_state_\([0-9]*\).pkl/\1/' | sort -n | tail -1)
[ -n "$LAST" ] && RESUME="train.resume_itr=$LAST"
exec nice -n 10 python -m dppo_tpu.run \
  --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img_96.yaml \
  logdir=$R/ft base_policy_path=$PRE \
  train.n_train_itr=$ITERS train.save_model_freq=50 train.val_freq=25 \
  $RESUME
