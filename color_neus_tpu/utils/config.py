"""YAML config system, schema-compatible with the reference's yacs trees.

The reference (lib/utils/config.py) uses yacs CfgNode with UPPERCASE keys;
we keep the same YAML schema (so reference config/*.yml files load 1:1)
but store them as a lightweight frozen attr-dict. CLI overrides mirror
get_config (config.py:89-103): batch size, reload checkpoint, obj id.
"""

from __future__ import annotations

import copy

import yaml


class Config(dict):
    """Read-only-ish nested dict with attribute access (cfg.MODEL.N_RAYS)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self):
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o
        return unwrap(self)

    def dump_yaml(self, path: str):
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


DEFAULTS = {
    "DATA_PRESET": {},
    "DATASET": {},
    "TRAIN": {
        "MANUAL_SEED": 1,
        "CONV_REPEATABLE": True,
        "BATCH_SIZE": 8,
        "LOG_INTERVAL": 50,
        "GRAD_CLIP_ENABLED": True,
        "GRAD_CLIP": {"TYPE": 2, "NORM": 0.001},
    },
    "MODEL": {"PRETRAINED": None},
}


def _deep_merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def get_config(config_file: str, arg=None, merge: bool = True) -> Config:
    """Load YAML, merge over defaults, apply CLI overrides (config.py:74-108)."""
    with open(config_file) as f:
        loaded = yaml.safe_load(f) or {}
    cfg = _deep_merge(DEFAULTS, loaded) if merge else loaded

    if arg is not None:
        if getattr(arg, "batch_size", None) is not None:
            cfg["TRAIN"]["BATCH_SIZE"] = arg.batch_size
        else:
            arg.batch_size = cfg["TRAIN"]["BATCH_SIZE"]
        if getattr(arg, "reload", None) is not None:
            cfg["MODEL"]["PRETRAINED"] = arg.reload
        if getattr(arg, "obj_id", None) is not None:
            cfg.setdefault("DATASET", {})["OBJ_ID"] = arg.obj_id

    return Config.wrap(cfg)
