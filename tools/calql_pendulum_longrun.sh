#!/bin/bash
# Fused Cal-QL evidence run on the TPU-resident Pendulum env: demo dataset
# (with rewards/terminals -> Q-learning loadable, MC reward-to-go) ->
# online Cal-QL where each fused block (env macro-steps + pending-window
# reward-to-go + replay flush + mixed offline/online calibrated updates)
# is ONE XLA dispatch (TrainCalQLDeviceAgent).
set -e
R=/root/repo/runs/calql_pendulum
mkdir -p $R
cd /root/repo
python - <<'PY'
from dppo_tpu.data.synthetic import collect_gym_demos
collect_gym_demos("pendulum-v1", "/root/repo/runs/calql_pendulum/train.npz",
                  "/root/repo/runs/calql_pendulum/normalization.npz",
                  n_episodes=50, max_steps=200)
print("demos done", flush=True)
PY
python -m dppo_tpu.run --config cfg/gym/finetune/pendulum-v1/calql_mlp_online.yaml \
  logdir=$R/ft offline_dataset_path=$R/train.npz \
  normalization_path=$R/normalization.npz \
  train.n_train_itr=6000 train.block_iters=200 train.num_update=20 \
  train.val_freq=1000 train.log_freq=200 train.save_model_freq=2000
echo LONGRUN_DONE
