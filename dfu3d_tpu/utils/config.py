"""Config system: YAML tree + `_BASE_CONFIG_` inheritance + dotted CLI overrides.

Keeps the reference's public config surface (pcdet/config.py: the global `cfg`
EasyDict, `cfg_from_yaml_file` with recursive `_BASE_CONFIG_` merge, and typed
`--set KEY VALUE` overrides) so existing YAMLs port over unchanged. EasyDict is
re-implemented here as `CfgDict` (attribute-style dict) to avoid the external
dep.

One deliberate behavioral upgrade (SURVEY §5.6): base-config paths are resolved
relative to the including file (falling back to CWD and the repo root), instead
of requiring the reference's CWD-sensitive relative paths.
"""
from __future__ import annotations

from ast import literal_eval
from pathlib import Path

import yaml


class CfgDict(dict):
    """dict with attribute access, recursively converting nested dicts."""

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, CfgDict):
            value = CfgDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                CfgDict(x) if isinstance(x, dict) and not isinstance(x, CfgDict) else x
                for x in value
            )
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __delattr__(self, key):
        del self[key]

    def get(self, key, default=None):
        return self[key] if key in self else default


def thaw_cfg(obj):
    """Convert any nested Mapping (e.g. flax FrozenDict) back into CfgDict."""
    from collections.abc import Mapping

    if isinstance(obj, Mapping):
        out = CfgDict()
        for k, v in obj.items():
            out[k] = thaw_cfg(v)
        return out
    if isinstance(obj, (list, tuple)):
        return type(obj)(thaw_cfg(x) for x in obj)
    return obj


def _load_yaml(path):
    with open(path, "r") as f:
        return yaml.safe_load(f)


def _resolve_base_path(base: str, including_file: Path) -> Path:
    """Resolve a _BASE_CONFIG_ path: relative to the including file, then its
    parents, then CWD."""
    cand = Path(base)
    if cand.is_absolute() and cand.exists():
        return cand
    for anchor in [including_file.parent, *including_file.parents, Path.cwd()]:
        p = anchor / base
        if p.exists():
            return p
        # the reference writes "cfgs/dataset_configs/x.yaml" relative to tools/
        if base.startswith("cfgs/") and anchor.name == "cfgs":
            p = anchor.parent / base
            if p.exists():
                return p
    raise FileNotFoundError(f"_BASE_CONFIG_ not found: {base} (from {including_file})")


def merge_new_config(config, new_config, cfg_path: Path | None = None):
    """Recursive merge with `_BASE_CONFIG_` expansion (reference config.py:51-68)."""
    if "_BASE_CONFIG_" in new_config:
        base_file = _resolve_base_path(new_config["_BASE_CONFIG_"], cfg_path or Path.cwd())
        # expand the base recursively so base files may themselves inherit
        # (model-variant chains like second_ps → second → dataset base);
        # the reference's merge (config.py:51-68) loads one level only
        merge_new_config(config, CfgDict(_load_yaml(base_file)), base_file)

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config or not isinstance(config[key], dict):
            config[key] = CfgDict()
        merge_new_config(config[key], val, cfg_path)
    return config


def cfg_from_yaml_file(cfg_file, config):
    cfg_file = Path(cfg_file)
    merge_new_config(config=config, new_config=_load_yaml(cfg_file), cfg_path=cfg_file)
    return config


def cfg_from_list(cfg_list, config):
    """Typed dotted overrides, e.g. ``--set MODEL.DENSE_HEAD.NMS_THRESH 0.7``
    (reference config.py:16-48 semantics, including dict/list coercions)."""
    assert len(cfg_list) % 2 == 0, "override list must be KEY VALUE pairs"
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split(".")
        d = config
        for subkey in key_list[:-1]:
            assert subkey in d, f"NotFoundKey: {subkey}"
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, f"NotFoundKey: {subkey}"
        try:
            value = literal_eval(v)
        except Exception:
            value = v

        if type(value) != type(d[subkey]) and isinstance(d[subkey], dict):
            for src in value.split(","):
                cur_key, cur_val = src.split(":")
                val_type = type(d[subkey][cur_key])
                d[subkey][cur_key] = val_type(cur_val)
        elif type(value) != type(d[subkey]) and isinstance(d[subkey], list):
            elem_type = type(d[subkey][0]) if d[subkey] else str
            d[subkey] = [elem_type(x) for x in value.split(",")]
        else:
            assert type(value) == type(d[subkey]), (
                f"type {type(value)} does not match original type {type(d[subkey])}"
            )
            d[subkey] = value
    return config


def log_config_to_file(cfg_, pre="cfg", logger=None):
    for key, val in cfg_.items():
        if isinstance(val, dict):
            logger.info("----------- %s -----------" % key)
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
            continue
        logger.info("%s.%s: %s" % (pre, key, val))


cfg = CfgDict()
cfg.ROOT_DIR = Path(__file__).resolve().parents[2]
cfg.LOCAL_RANK = 0
