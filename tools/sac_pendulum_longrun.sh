#!/bin/bash
# SAC-from-scratch evidence run, fully TPU-resident: env, replay ring, and
# TD updates on the chip, fused in blocks of 500 iterations per XLA
# dispatch (dppo_tpu/agents/finetune_sac_device.py). 30k iterations x 16
# envs on Pendulum; no demos, no pretrain.
set -e
R=/root/repo/runs/sac_pendulum
mkdir -p $R
cd /root/repo
python -m dppo_tpu.run --config cfg/gym/scratch/pendulum-v1/sac_mlp.yaml \
  logdir=$R normalization_path=null
echo SAC_DONE
