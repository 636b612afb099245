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
    ensure_assets(cfg)
    cls = get_class(cfg._target_)
    agent = cls(cfg)
    agent.run()


def ensure_assets(cfg) -> None:
    """Check (and, when a URL is registered, fetch) run assets.

    Parity with the launcher's lazy auto-download (`script/run.py:48-78`):
    the reference pulls datasets / normalization stats / pretrained
    checkpoints from Google Drive. On zero-egress hosts this surfaces an
    actionable local-generation recipe instead of a FileNotFoundError deep
    inside the agent.
    """
    from dppo_tpu.scripts import download_url as du

    checks = [
        ("train_dataset_path", du.get_dataset_download_url),
        ("normalization_path", du.get_normalization_download_url),
        ("base_policy_path", du.get_checkpoint_download_url),
    ]
    for key, get_url in checks:
        path = cfg.get(key)
        if not path or os.path.exists(str(path)):
            continue
        try:
            url = get_url(cfg)
        except LookupError as e:
            raise FileNotFoundError(f"{key}={path} does not exist. {e}") from e
        import urllib.request

        os.makedirs(os.path.dirname(str(path)), exist_ok=True)
        logging.getLogger(__name__).info("Downloading %s -> %s", url, path)
        urllib.request.urlretrieve(url, str(path))


if __name__ == "__main__":
    main()
