"""Config system: YAML + interpolation + safe computed fields + `_target_` instantiation.

Schema-compatible with the reference's Hydra/OmegaConf configs
(`/root/reference/dppo/cfg/**/*.yaml`, entry `script/run.py:37-91`) without
depending on Hydra. Differences, by design:

  - ``${eval:'...'}`` is evaluated by a safe AST-walking arithmetic evaluator,
    not Python ``eval`` (the reference registers a raw ``eval`` resolver at
    `run.py:22`).
  - ``${oc.env:VAR}`` / ``${env:VAR}`` read environment variables.
  - ``${now:%fmt}`` formats the launch timestamp.
  - reference `_target_` paths (``dppo.model...``) are remapped onto our
    classes through :mod:`dppo_tpu.registry`, so reference YAMLs load as-is.
"""

from __future__ import annotations

import ast
import copy
import datetime
import importlib
import operator
import os
import re
from typing import Any, Callable, Mapping, Optional

import yaml

__all__ = [
    "Config",
    "load_config",
    "instantiate",
    "resolve",
    "safe_eval",
    "to_container",
]

_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")

_LAUNCH_TIME = datetime.datetime.now()

_BIN_OPS: dict[type, Callable] = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.FloorDiv: operator.floordiv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
}
_UNARY_OPS: dict[type, Callable] = {ast.USub: operator.neg, ast.UAdd: operator.pos}
_SAFE_FUNCS: dict[str, Callable] = {
    "round": round,
    "int": int,
    "float": float,
    "min": min,
    "max": max,
    "abs": abs,
    "len": len,
}


def safe_eval(expr: str) -> Any:
    """Evaluate a small arithmetic expression without executing arbitrary code.

    Supports numbers, strings, lists/tuples, + - * / // % **, unary +/-,
    comparisons, boolean ops, conditional expressions, and whitelisted calls
    (round/int/float/min/max/abs/len). Covers every ``${eval:...}`` usage in
    the reference config tree (e.g. ``round(${env.max_episode_steps} /
    ${act_steps})``).
    """
    node = ast.parse(expr, mode="eval").body

    def ev(n: ast.AST) -> Any:
        if isinstance(n, ast.Constant):
            return n.value
        if isinstance(n, ast.BinOp) and type(n.op) in _BIN_OPS:
            return _BIN_OPS[type(n.op)](ev(n.left), ev(n.right))
        if isinstance(n, ast.UnaryOp) and type(n.op) in _UNARY_OPS:
            return _UNARY_OPS[type(n.op)](ev(n.operand))
        if isinstance(n, (ast.List, ast.Tuple)):
            return [ev(e) for e in n.elts]
        if isinstance(n, ast.Compare):
            left = ev(n.left)
            for op, comp in zip(n.ops, n.comparators):
                right = ev(comp)
                ok = {
                    ast.Eq: operator.eq,
                    ast.NotEq: operator.ne,
                    ast.Lt: operator.lt,
                    ast.LtE: operator.le,
                    ast.Gt: operator.gt,
                    ast.GtE: operator.ge,
                }[type(op)](left, right)
                if not ok:
                    return False
                left = right
            return True
        if isinstance(n, ast.BoolOp):
            vals = [ev(v) for v in n.values]
            return all(vals) if isinstance(n.op, ast.And) else any(vals)
        if isinstance(n, ast.IfExp):
            return ev(n.body) if ev(n.test) else ev(n.orelse)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Name):
            fn = _SAFE_FUNCS.get(n.func.id)
            if fn is None:
                raise ValueError(f"function not allowed in eval resolver: {n.func.id}")
            return fn(*[ev(a) for a in n.args])
        raise ValueError(f"unsupported expression in eval resolver: {ast.dump(n)}")

    return ev(node)


class Config(dict):
    """A dict with attribute access and `.get` semantics matching OmegaConf usage."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _wrap(obj: Any) -> Any:
    if isinstance(obj, Mapping) and not isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, Config):
        return Config({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


_INDEX_RE = re.compile(r"^([^\[\]]+)((?:\[\d+\])*)$")


def _select(root: Any, dotted: str) -> Any:
    cur = root
    for part in dotted.split("."):
        m = _INDEX_RE.match(part)
        key, idx_str = (m.group(1), m.group(2)) if m else (part, "")
        if isinstance(cur, Mapping):
            if key not in cur:
                raise KeyError(f"interpolation key not found: {dotted!r}")
            cur = cur[key]
        elif isinstance(cur, list):
            cur = cur[int(key)]
        else:
            raise KeyError(f"cannot descend into {type(cur)} for {dotted!r}")
        for idx in re.findall(r"\[(\d+)\]", idx_str):
            cur = cur[int(idx)]
    return cur


def _resolve_value(val: Any, root: Any) -> Any:
    if isinstance(val, str):
        return _resolve_str(val, root)
    if isinstance(val, Mapping):
        return Config({k: _resolve_value(v, root) for k, v in val.items()})
    if isinstance(val, list):
        return [_resolve_value(v, root) for v in val]
    return val


def _full_interp_body(s: str) -> Optional[str]:
    """If `s` is exactly one `${...}` (allowing nested braces), return the body."""
    s = s.strip()
    if not (s.startswith("${") and s.endswith("}")):
        return None
    depth = 0
    for i, ch in enumerate(s):
        if s[i : i + 2] == "${":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return s[2:-1] if i == len(s) - 1 else None
    return None


def _resolve_str(s: str, root: Any) -> Any:
    # Full-string single interpolation returns the referenced value with its type.
    body = _full_interp_body(s)
    if body is not None:
        return _apply_resolver(body, root)

    def sub(mm: re.Match) -> str:
        v = _apply_resolver(mm.group(1), root)
        return str(v)

    out, n = _INTERP_RE.subn(sub, s)
    while n and _INTERP_RE.search(out):  # nested interpolations
        out, n = _INTERP_RE.subn(sub, out)
    return out


def _apply_resolver(body: str, root: Any) -> Any:
    body = body.strip()
    if body.startswith("oc.env:") or body.startswith("env:"):
        var = body.split(":", 1)[1]
        default = None
        if "," in var:
            var, default = (x.strip() for x in var.split(",", 1))
        val = os.environ.get(var, default)
        if val is None:
            raise KeyError(f"environment variable not set: {var}")
        return val
    if body.startswith("now:"):
        return _LAUNCH_TIME.strftime(body.split(":", 1)[1])
    if body.startswith("eval:"):
        expr = body.split(":", 1)[1].strip()
        if (expr.startswith("'") and expr.endswith("'")) or (
            expr.startswith('"') and expr.endswith('"')
        ):
            expr = expr[1:-1]
        # interpolate inner ${...} first
        expr = str(_resolve_str(expr, root)) if _INTERP_RE.search(expr) else expr
        return safe_eval(expr)
    if body.startswith("round_up:"):
        return int(-(-float(_resolve_str(body.split(":", 1)[1], root)) // 1))
    if body.startswith("round_down:"):
        return int(float(_resolve_str(body.split(":", 1)[1], root)) // 1)
    # plain dotted select; resolve recursively in case target itself interpolates
    val = _select(root, body)
    if isinstance(val, str) and _INTERP_RE.search(val):
        return _resolve_str(val, root)
    return val


def resolve(cfg: Mapping) -> Config:
    """Resolve every interpolation in `cfg`, returning a new Config tree."""
    return _resolve_value(_wrap(cfg), _wrap(cfg))


class _YamlLoader(yaml.SafeLoader):
    """SafeLoader with an OmegaConf-compatible float resolver: bare
    scientific notation (`1e-4`) parses as float, matching how the
    reference's Hydra/OmegaConf stack reads its 279 experiment YAMLs
    (PyYAML's stock YAML-1.1 resolver would return the string)."""


_YamlLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float",
    re.compile(
        r"""^(?:[-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
        |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
        |[-+]?\.[0-9_]+(?:[eE][-+]?[0-9]+)?
        |[-+]?\.(?:inf|Inf|INF)
        |\.(?:nan|NaN|NAN))$""",
        re.X,
    ),
    list("-+0123456789."),
)


def yaml_load(stream):
    return yaml.load(stream, Loader=_YamlLoader)


def _parse_override_value(s: str) -> Any:
    try:
        return yaml_load(s)
    except yaml.YAMLError:
        return s


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply Hydra-style dotted `key=value` overrides in place."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must look like key=value, got {ov!r}")
        key, val = ov.split("=", 1)
        key = key.lstrip("+")
        parts = key.split(".")
        cur: Any = cfg
        for p in parts[:-1]:
            if p not in cur or not isinstance(cur[p], Mapping):
                cur[p] = Config()
            cur = cur[p]
        cur[parts[-1]] = _parse_override_value(val)
    return cfg


def load_config(path: str, overrides: list[str] | None = None) -> Config:
    """Load a YAML config file, apply overrides, and resolve interpolations."""
    with open(path) as f:
        raw = yaml_load(f)
    raw.pop("hydra", None)
    raw.pop("defaults", None)
    cfg = _wrap(raw)
    if overrides:
        apply_overrides(cfg, overrides)
    return resolve(cfg)


def to_container(cfg: Any) -> Any:
    if isinstance(cfg, Mapping):
        return {k: to_container(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [to_container(v) for v in cfg]
    return cfg


def get_class(path: str) -> Any:
    """Import a class/function from a dotted path, remapping reference paths."""
    from dppo_tpu.registry import TARGET_ALIASES

    path = TARGET_ALIASES.get(path, path)
    module, _, name = path.rpartition(".")
    return getattr(importlib.import_module(module), name)


def instantiate(node: Any, **kwargs: Any) -> Any:
    """Hydra-like recursive instantiation of a ``_target_`` node.

    Child mappings that themselves carry ``_target_`` are instantiated first
    (matching `hydra.utils.instantiate` used throughout the reference agents,
    e.g. `agent/finetune/train_agent.py:84`).
    """
    if not isinstance(node, Mapping) or "_target_" not in node:
        raise ValueError("instantiate() needs a mapping with a _target_ key")
    cls = get_class(node["_target_"])
    args: dict[str, Any] = {}
    for k, v in node.items():
        if k.startswith("_"):
            continue
        if isinstance(v, Mapping) and "_target_" in v:
            args[k] = instantiate(v)
        else:
            args[k] = to_plain(v)
    args.update(kwargs)
    return cls(**args)


def to_plain(v: Any) -> Any:
    """Containers stay Config (attr access) but lists of scalars become lists."""
    return v
