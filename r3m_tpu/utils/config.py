"""Minimal Hydra-style config system: YAML + ${interpolation} + CLI overrides.

The reference uses hydra-core + OmegaConf (``/root/reference/r3m/cfgs/
config_rep.yaml``, ``train_representation.py:140``) for: (a) a root YAML
with an ``agent`` sub-node, (b) ``${var}`` interpolation, (c)
``key=value`` CLI dotlist overrides, and (d) object instantiation from
``_target_``. This module provides those four capabilities with no
external dependency (hydra isn't in the TPU image), keeping the same
config file shape so reference users can port their YAML/CLI workflows
unchanged.
"""

from __future__ import annotations

import copy
import re
from typing import Any, Dict, List, Optional

import yaml

_INTERP = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_EMBEDDED = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")
_NOW = re.compile(r"\$\{now:([^}]+)\}")
_MISSING = object()  # sentinel: distinguish absent keys from null values


class Config(dict):
    """dict with attribute access and nested dot-path get/set."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        if isinstance(v, dict) and not isinstance(v, Config):
            # cache the converted child back so attribute writes to nested
            # nodes (cfg.agent.langweight = 1.0) mutate THIS config, not a
            # throwaway copy
            v = Config(v)
            self[k] = v
        return v

    def __setattr__(self, k, v):
        self[k] = v

    def get_path(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value):
        parts = path.split(".")
        node: Dict = self
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def has_path(self, path: str) -> bool:
        node: Any = self
        for p in path.split("."):
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True


def _parse_value(text: str) -> Any:
    """YAML-typed scalar parse ('1e-4' -> float, 'true' -> bool, ...)."""
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def _resolve(node: Any, root: Dict, _stack: tuple = (), _now=None) -> Any:
    if _now is None:
        # one timestamp per top-level resolve: every ${now:} in a config
        # names the SAME instant (Hydra run-dir semantics — a launch maps
        # to exactly one date-templated directory)
        import time

        _now = time.localtime()
    if isinstance(node, dict):
        return {k: _resolve(v, root, _stack, _now) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root, _stack, _now) for v in node]
    if isinstance(node, str):
        def lookup(key: str, expr: str):
            if key in _stack:
                raise ValueError(
                    "interpolation cycle: "
                    + " -> ".join((*_stack, key))
                )
            ref = Config(root).get_path(key, default=_MISSING)
            if ref is _MISSING:
                raise KeyError(f"unresolvable interpolation: {expr}")
            # null-valued keys (n_devices: ~) resolve to None, as OmegaConf
            return _resolve(ref, root, _stack + (key,), _now)

        if _NOW.search(node):
            # OmegaConf's `now` resolver — the reference's date-templated
            # run dirs (r3m/cfgs/hydra/output/local.yaml:3-8, e.g.
            # `log_dir: ./r3moutput/${now:%Y-%m-%d}_${now:%H-%M-%S}`)
            import time

            node = _NOW.sub(lambda mm: time.strftime(mm.group(1), _now), node)

        m = _INTERP.match(node)
        if m:  # whole-string interpolation keeps the referent's TYPE
            return lookup(m.group(1), node)
        if _INTERP_EMBEDDED.search(node):
            # embedded form ('${root}/data') substitutes as text (OmegaConf
            # string-interpolation semantics)
            return _INTERP_EMBEDDED.sub(
                lambda mm: str(lookup(mm.group(1), mm.group(0))), node
            )
    return node


def load_config(
    path: Optional[str] = None,
    overrides: Optional[List[str]] = None,
    base: Optional[Dict] = None,
) -> Config:
    """Load YAML, apply `key.path=value` overrides, resolve ${...}."""
    cfg: Dict = copy.deepcopy(base) if base else {}
    if path is not None:
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        cfg.update(loaded)
    c = Config(cfg)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, val = ov.split("=", 1)
        key = key.strip()
        # Hydra-strict semantics: overriding an unknown key is an error
        # (catches silent typos like `batch_sise=4`); `+key=value` adds.
        if key.startswith("+"):
            key = key[1:]
        elif (path is not None or base) and not c.has_path(key):
            # strict for file- AND base-dict-backed configs; only a config
            # built purely from overrides has no key set to validate against
            raise KeyError(
                f"unknown config key {key!r} (use +{key}=... to add a new key)"
            )
        c.set_path(key, _parse_value(val))
    resolved = _resolve(dict(c), dict(c))
    return Config(resolved)


def instantiate(node: Dict, **extra) -> Any:
    """Hydra-style `_target_` instantiation (r3m/__init__.py:71)."""
    node = dict(node)
    target = node.pop("_target_")
    mod_name, _, attr = target.rpartition(".")
    import importlib

    obj = getattr(importlib.import_module(mod_name), attr)
    node.update(extra)
    return obj(**node)


def agent_to_r3m_config(agent: Dict) -> "Any":
    """Map a reference-style `agent` config node onto `R3MConfig`.

    Accepts the reference field set (r3m/cfgs/config_rep.yaml:30-41),
    ignoring torch-only keys (`device`, `_target_`).
    """
    import dataclasses

    from r3m_tpu.models.r3m import R3MConfig

    fields = {f.name: f for f in dataclasses.fields(R3MConfig)}
    kwargs = {}
    for k, v in agent.items():
        if k not in fields:
            continue
        # pyyaml parses exponent-only literals like `1e-5` as strings
        # (YAML 1.1 requires a dot); coerce to the dataclass field type.
        ftype = fields[k].type
        if isinstance(v, str) and ftype in ("float", float):
            try:
                v = float(v)
            except ValueError:
                if k != "lr":
                    raise
                # lr accepts schedule strings ('linear(...)'/'step_linear(...)'
                # — the reference's schedule() grammar); validate it parses
                from r3m_tpu.utils.misc import schedule_fn

                schedule_fn(v)
        elif isinstance(v, str) and ftype in ("int", int):
            v = int(float(v))
        kwargs[k] = v
    return R3MConfig(**kwargs)
