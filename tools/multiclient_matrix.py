"""Multi-client saturation matrix (VERDICT r4 #8): how does AGGREGATE
training throughput on this rig scale with concurrent host-env clients?

The r4 evidence showed a single host-env run leaves the chip ~95% idle
(time/env 13s of a 14s halfcheetah iteration on the 2-vCPU host) and that
the tunnel serializes multiple clients without collapsing (bench.py r4:
2.91M denoise-steps/s median WITH four concurrent clients, <1% IQR — the
chip side is already evidenced). The open question is host-side: the
marginal value of adding hopper-class (batched-MuJoCo, 40 envs) clients.

Method: phases of ~N_ITERS probe iterations each — phase k runs k
concurrent hopper-probe clients (fresh ft from the prestaged BC
checkpoint, no eval) on top of whatever long-running client is already
active (the walker extension, whose per-iteration rate is read from its
log timestamps inside each phase window). Aggregate env-steps/s per phase
= sum of clients' mean env_steps_per_s. Writes MULTICLIENT.json.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
import subprocess
import sys
import time

REPO = "/root/repo"
R = f"{REPO}/runs/multiclient"
N_ITERS = int(os.environ.get("N_ITERS", "10"))
WALKER_LOG = f"{REPO}/runs/walker_r5.log"

RATE_RE = re.compile(r"env_steps_per_s\s+([0-9.]+)")
TS_RE = re.compile(r"^\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})")


def probe_cmd(i):
    return [
        "nice", "-n", "10", sys.executable, "-m", "dppo_tpu.run",
        "--config", "cfg/gym/finetune/hopper-v2/ft_ppo_diffusion_mlp.yaml",
        f"logdir={R}/probe{i}",
        f"base_policy_path={REPO}/runs/hopper/pre/checkpoint/state_200.pkl",
        f"normalization_path={REPO}/runs/hopper/normalization.npz",
        "env.backend=batched_mujoco",
        f"train.n_train_itr={N_ITERS}",
        "train.val_freq=1000", "train.save_model_freq=1000",
        "train.n_critic_warmup_itr=0",
    ]


def mean_rate(log_path, t0=None, t1=None):
    rates = []
    try:
        with open(log_path) as f:
            for line in f:
                m = RATE_RE.search(line)
                if not m:
                    continue
                if t0 is not None:
                    ts = TS_RE.match(line)
                    if not ts:
                        continue
                    t = dt.datetime.strptime(ts.group(1), "%Y-%m-%d %H:%M:%S")
                    if not (t0 <= t <= t1):
                        continue
                rates.append(float(m.group(1)))
    except FileNotFoundError:
        return None, 0
    if not rates:
        return None, 0
    return sum(rates) / len(rates), len(rates)


def main():
    os.makedirs(R, exist_ok=True)
    results = {}
    walker_running = os.path.exists(WALKER_LOG)
    for n_probes in (0, 1, 2, 3):
        if n_probes == 0 and not walker_running:
            continue
        t0 = dt.datetime.now()
        procs = []
        for i in range(n_probes):
            with open(f"{R}/probe{n_probes}_{i}.log", "w") as out:
                procs.append(subprocess.Popen(
                    probe_cmd(f"{n_probes}_{i}"), stdout=out,
                    stderr=subprocess.STDOUT, cwd=REPO,
                ))
        if n_probes == 0:
            time.sleep(240)  # walker-alone window
        for p in procs:
            p.wait()
        t1 = dt.datetime.now()
        phase = {"clients": [], "window_s": (t1 - t0).total_seconds()}
        if walker_running:
            wr, wn = mean_rate(WALKER_LOG, t0, t1)
            if wr:
                phase["clients"].append(
                    {"name": "walker (long-run)", "env_steps_per_s": round(wr, 1),
                     "iters_in_window": wn}
                )
        for i in range(n_probes):
            pr, pn = mean_rate(f"{R}/probe{n_probes}_{i}.log")
            if pr:
                phase["clients"].append(
                    {"name": f"hopper probe {i}", "env_steps_per_s": round(pr, 1),
                     "iters_in_window": pn}
                )
        phase["aggregate_env_steps_per_s"] = round(
            sum(c["env_steps_per_s"] for c in phase["clients"]), 1
        )
        results[str(n_probes + (1 if walker_running else 0))] = phase
        print(json.dumps({f"phase_{n_probes}": phase}), flush=True)
    out_path = f"{REPO}/MULTICLIENT.json"
    payload = {
        "host": "2 vCPU build host + 1 v5e via axon tunnel",
        "probe": f"hopper ft, 40 envs x 500 steps, batched_mujoco, {N_ITERS} iters, no eval",
        "note": (
            "clients counted = concurrent training processes sharing the "
            "host cores and the tunnel chip; chip-side concurrency was "
            "separately evidenced in r4 (bench median unchanged with 4 "
            "clients). Aggregate rate vs client count is the fleet-"
            "throughput knob for this rig."
        ),
        "phases_by_total_clients": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
