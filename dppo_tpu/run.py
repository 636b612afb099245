"""CLI launcher.

Parity with `script/run.py:37-91`: resolve a YAML config, instantiate the
agent class named by `_target_`, call `agent.run()`. Dataset/checkpoint
auto-download is replaced by local generation helpers (zero-egress
environment); pass `--make-dataset` to synthesize demos for gym tasks.

Usage:
    python -m dppo_tpu.run --config cfg/gym/pretrain/hopper-medium-v2/pre_diffusion_mlp.yaml [key=value ...]
    python -m dppo_tpu.run --config-name ft_ppo_diffusion_mlp --config-dir cfg/gym/finetune/hopper-v2 [overrides]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="dppo_tpu launcher")
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--config-name", type=str, default=None)
    parser.add_argument("--config-dir", type=str, default=None)
    parser.add_argument(
        "--platform",
        type=str,
        default=None,
        help="force a jax platform (tpu/cpu); default: jax's choice",
    )
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
    )

    from dppo_tpu.config import get_class, load_config

    if args.config:
        cfg_path = args.config
    elif args.config_name and args.config_dir:
        name = args.config_name
        if not name.endswith(".yaml"):
            name += ".yaml"
        cfg_path = os.path.join(args.config_dir, name)
    else:
        parser.error("pass --config or (--config-name and --config-dir)")

    cfg = load_config(cfg_path, overrides=args.overrides)
    logdir = cfg.get("logdir")
    if logdir:
        os.makedirs(logdir, exist_ok=True)
    cls = get_class(cfg._target_)
    agent = cls(cfg)
    agent.run()


if __name__ == "__main__":
    main()
