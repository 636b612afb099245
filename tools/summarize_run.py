"""Summarize a finetune run's result.pkl into a compact evidence block.

Usage: python tools/summarize_run.py <logdir> [n_deciles]

Prints train-reward deciles over iterations, eval rows, and final/best
stats — the evidence block used in PROGRESS.md / README.md. Row schema per
`agents/finetune_base._log_iteration`: every row has itr/step; train rows
carry `train_episode_reward`, eval rows `eval_*`.
"""

import pickle
import sys


def main():
    logdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    with open(f"{logdir}/result.pkl", "rb") as f:
        rows = pickle.load(f)
    if not rows:
        print("rows: 0 (run produced no logged iterations)")
        return
    train = [r for r in rows if "train_episode_reward" in r]
    evals = [r for r in rows if "eval_episode_reward" in r]
    print(f"rows: {len(rows)} ({len(train)} train, {len(evals)} eval); "
          f"final env step count: {rows[-1]['step']:,}")
    rewards = [float(r["train_episode_reward"]) for r in train]
    if rewards:
        n = max(2, min(n, len(rewards)))
        idx = [round(i * (len(rewards) - 1) / (n - 1)) for i in range(n)]
        decs = "  ".join(f"{rewards[i]:.1f}" for i in idx)
        print(f"train avg episode reward deciles:\n  {decs}")
        print(f"final train reward: {rewards[-1]:.1f}   "
              f"best: {max(rewards):.1f}")
    for r in evals:
        print(
            f"eval @ itr {r['itr']} (step {r['step']:,}): "
            f"success {float(r['eval_success_rate']):.2f}  "
            f"episode reward {float(r['eval_episode_reward']):.1f}  "
            f"best reward {float(r['eval_best_reward']):.2f}"
        )


if __name__ == "__main__":
    main()
