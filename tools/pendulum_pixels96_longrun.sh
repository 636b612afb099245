#!/bin/bash
# PIXEL DPPO at the REFERENCE operating point (96x96, K=100 -> DDIM 5,
# grad_accumulate 15 — reference ft_ppo_diffusion_mlp_img.yaml:19-25,68,90):
# demos with 96x96 on-device-rendered frames -> K=100 VisionDiffusionMLP BC
# pretrain -> fused DDIM-5 finetune. VERDICT r4 item #2 second half, plus a
# resolution-hypothesis test for the 48x48 stall (angle readout precision
# near upright quadruples at 96x96).
set -e
ITERS=${ITERS:-600}
R=/root/repo/runs/pendulum_pixels96
mkdir -p $R
cd /root/repo
if [ ! -f $R/train.npz ]; then
python - <<'PY'
from dppo_tpu.data.synthetic import collect_pendulum_pixel_demos
collect_pendulum_pixel_demos("/root/repo/runs/pendulum_pixels96/train.npz",
                             n_episodes=25, max_steps=200, img_h=96, img_w=96)
print("pixel96 demos done", flush=True)
PY
fi
if [ ! -f $R/pre/checkpoint/state_200.pkl ]; then
nice -n 10 python -m dppo_tpu.run --config cfg/gym/pretrain/pendulum-v1/pre_diffusion_mlp_img_96.yaml \
  logdir=$R/pre train_dataset_path=$R/train.npz \
  train.n_epochs=200 train.save_model_freq=200
fi
nice -n 10 python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_ppo_diffusion_mlp_img_96.yaml \
  logdir=$R/ft base_policy_path=$R/pre/checkpoint/state_200.pkl \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=25
echo PIXELS96_DONE
