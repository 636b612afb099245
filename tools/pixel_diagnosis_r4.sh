#!/bin/bash
# Round-4 pixel-stall diagnosis (VERDICT r3 weak #2 / next #2).
#
# runs/pendulum_pixels_r3f.log shows the 3000-iter ft5 leg flat from
# iteration 1: approx_kl~0, ratio~1, explained_variance~0.03, train reward
# pinned at ~-950.  Hypothesis: the policy collapsed to a homogeneous
# swing behavior -- every episode returns ~-950, so the raw advantage
# spread (new adv_std diagnostic) is ~0 and minibatch advantage
# normalization amplifies GAE noise instead of signal; the exploration
# floor (min_sampling_denoising_std 0.1) is too low to re-diversify.
#
# Three intervention arms, each resuming the STALLED full train state
# (ft5 full_state_2999) so the experiment tests "does X un-stick it":
#   armA  exploration: min_sampling_denoising_std 0.1 -> 0.25
#   armB  step size:   actor_lr 1e-4 -> 3e-4 (constant)
#   armAB both
set -e
R=/root/repo/runs/pendulum_pixels
cd /root/repo
ITERS=${ITERS:-3400}   # resumes at itr 3000
for arm in "$@"; do
  case $arm in
    armA)  OV="model.min_sampling_denoising_std=0.25" ;;
    armB)  OV="train.actor_lr=3e-4 train.actor_lr_scheduler.min_lr=3e-4" ;;
    armAB) OV="model.min_sampling_denoising_std=0.25 train.actor_lr=3e-4 train.actor_lr_scheduler.min_lr=3e-4" ;;
    *) echo "unknown arm $arm"; exit 1 ;;
  esac
  mkdir -p $R/diag_$arm/checkpoint
  cp -n $R/ft5/checkpoint/full_state_2999.pkl $R/diag_$arm/checkpoint/
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img.yaml \
    logdir=$R/diag_$arm base_policy_path=$R/pre/checkpoint/state_200.pkl \
    env.n_envs=128 \
    train.n_train_itr=$ITERS train.resume_itr=2999 \
    train.save_model_freq=200 train.val_freq=25 \
    $OV > /root/repo/runs/pixel_diag_$arm.log 2>&1 &
  echo "$arm PID $!"
done
wait
echo PIXEL_DIAG_DONE
