"""Every reference `_target_` alias must resolve to an importable object —
the contract that lets the reference's 279 YAML configs drive this
framework unchanged."""

import pytest

from dppo_tpu.config import get_class
from dppo_tpu.registry import TARGET_ALIASES


@pytest.mark.parametrize("ref_path", sorted(TARGET_ALIASES))
def test_alias_resolves(ref_path):
    obj = get_class(ref_path)
    assert obj is not None


def test_reference_config_targets_covered():
    """Every _target_ used in the reference cfg tree must be aliased."""
    import os
    import re

    ref_cfg = "/root/reference/dppo/cfg"
    if not os.path.isdir(ref_cfg):
        pytest.skip("reference tree not mounted")
    targets = set()
    for root, _, files in os.walk(ref_cfg):
        for f in files:
            if not f.endswith(".yaml"):
                continue
            with open(os.path.join(root, f)) as fh:
                for line in fh:
                    m = re.search(r"_target_:\s*([\w\.]+)", line)
                    if m:
                        targets.add(m.group(1))
    missing = {
        t
        for t in targets
        if t.startswith("dppo.") and t not in TARGET_ALIASES
    }
    assert not missing, f"unaliased reference targets: {sorted(missing)}"
