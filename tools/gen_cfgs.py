"""Generate the full experiment-config tree at reference parity.

The reference ships 279 experiment YAMLs under `cfg/` (SURVEY §2.1) — one
per (suite, phase, task, algo/net/obs) operating point. The YAML schema of
this repo intentionally matches the reference's (the `_target_` registry
maps every `dppo.*` path, registry.py), so each reference config is treated
as *data*: loaded, transformed to this repo's conventions, and re-emitted.

Transformations:
  - drop Hydra-specific blocks (`defaults`, `hydra`); null out `device`
    (JAX picks the platform; `--platform` on the CLI overrides)
  - `wandb: null` (offline metrics logger by default; set env vars and
    restore the block to enable W&B)
  - checkpoint paths: `.pt` -> `.pkl`, dated run dirs -> `latest` (this
    repo's checkpoints are pickled jax pytrees, ckpt.py)

Run:  python tools/gen_cfgs.py [--ref /root/reference/dppo/cfg] [--force]
Idempotent; hand-written configs (not marked generated) are never touched.
"""

from __future__ import annotations

import argparse
import os
import re

import yaml

GENERATED_MARK = "# generated-parity-config"
DATE_DIR_RE = re.compile(r"20\d{2}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}")
CKPT_RE = re.compile(r"\.pt\b")
DROP_KEYS = ("defaults", "hydra")


def transform_value(v):
    if isinstance(v, dict):
        return {k: transform_value(x) for k, x in v.items()}
    if isinstance(v, list):
        return [transform_value(x) for x in v]
    if isinstance(v, str):
        v = CKPT_RE.sub(".pkl", v)
        v = DATE_DIR_RE.sub("latest", v)
    return v


def _fix_stale(cfg: dict):
    """Repair configs that are stale in the reference itself: the gym
    eval_gaussian/eval_gmm YAMLs omit the network's required `action_dim`
    (their own `Gaussian_MLP.__init__` requires it, mlp_gaussian.py:18-22),
    which would crash the reference too. Interpolate it from the top level."""
    model = cfg.get("model") or {}
    for key in ("network", "actor"):
        net = model.get(key) or {}
        tgt = str(net.get("_target_", ""))
        if tgt.rsplit(".", 1)[-1] in ("Gaussian_MLP", "GMM_MLP") and (
            "action_dim" not in net and "action_dim" in cfg
        ):
            net["action_dim"] = "${action_dim}"


def transform(cfg: dict) -> dict:
    out = {}
    for k, v in cfg.items():
        if k in DROP_KEYS:
            continue
        if k in ("wandb", "device"):
            out[k] = None  # offline logger / JAX-managed placement
            continue
        out[k] = transform_value(v)
    _fix_stale(out)
    return out


def generate(ref_root: str, out_root: str, force: bool = False):
    made, skipped = [], []
    for dirpath, _dirs, files in os.walk(ref_root):
        for fn in sorted(files):
            if not fn.endswith(".yaml"):
                continue
            src = os.path.join(dirpath, fn)
            rel = os.path.relpath(src, ref_root)
            dst = os.path.join(out_root, rel)
            if os.path.exists(dst):
                with open(dst) as f:
                    head = f.read(200)
                if GENERATED_MARK not in head and not force:
                    skipped.append(rel)  # hand-written: keep
                    continue
                if GENERATED_MARK not in head:
                    skipped.append(rel)
                    continue
            with open(src) as f:
                raw = yaml.safe_load(f)
            cfg = transform(raw)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            body = yaml.dump(
                cfg, sort_keys=False, default_flow_style=False, width=100
            )
            with open(dst, "w") as f:
                f.write(
                    f"{GENERATED_MARK}\n"
                    f"# Operating point of the reference experiment cfg/{rel}\n"
                    f"# (hyperparameter data; regenerate via tools/gen_cfgs.py).\n"
                    + body
                )
            made.append(rel)
    return made, skipped


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref", default="/root/reference/dppo/cfg")
    parser.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "..", "cfg")
    )
    parser.add_argument("--force", action="store_true",
                        help="also regenerate files previously generated")
    args = parser.parse_args()
    made, skipped = generate(args.ref, os.path.abspath(args.out), args.force)
    print(f"generated {len(made)} configs; kept {len(skipped)} hand-written")


if __name__ == "__main__":
    main()
