#!/bin/bash
# AWR plateau triage (VERDICT round-2 weak #1): run the HOST-path AWR agent
# (per-macro-step venv stepping + host-jitted updates) on the SAME
# TPU-resident Pendulum env through the DeviceVectorEnv adapter, at the
# same operating point as the fused run in runs/awr_pendulum. If this
# curve beats the fused one, the fused path has a parity bug; if it stalls
# at the same level, the plateau is the algorithm's ceiling.
set -e
ITERS=${ITERS:-150}
R=/root/repo/runs/awr_host_triage
mkdir -p $R
cd /root/repo
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/ft_awr_diffusion_mlp.yaml \
  _target_=dppo_tpu.agents.finetune_awr_diffusion.TrainAWRDiffusionAgent \
  logdir=$R/ft base_policy_path=/root/repo/runs/awr_pendulum/pre/checkpoint/state_200.pkl \
  normalization_path=/root/repo/runs/awr_pendulum/normalization.npz \
  train.n_train_itr=$ITERS train.save_model_freq=100 train.val_freq=25
echo TRIAGE_DONE
