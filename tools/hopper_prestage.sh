#!/bin/bash
# Hopper prestage for round 5: regenerate demos + the 200-epoch BC pretrain
# (the r3 hopper checkpoints predate artifacts/ and died with the scratch
# disk). Feeds tools/multiclient_matrix.py probes and any hopper extension.
set -e
R=/root/repo/runs/hopper
mkdir -p $R
cd /root/repo
if [ ! -f $R/train.npz ]; then
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("Hopper-v4", "/root/repo/runs/hopper/train.npz",
                  "/root/repo/runs/hopper/normalization.npz",
                  n_episodes=50, max_steps=500)
print("demos done", flush=True)
PY
fi
if [ ! -f $R/pre/checkpoint/state_200.pkl ]; then
  nice -n 10 python -m dppo_tpu.run \
    --config cfg/gym/pretrain/hopper-medium-v2/pre_diffusion_mlp.yaml \
    logdir=$R/pre train_dataset_path=$R/train.npz \
    train.n_epochs=200 train.save_model_freq=200
fi
echo HOPPER_PRESTAGE_DONE
