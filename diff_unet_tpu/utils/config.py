"""YAML config / flag system.

Capability parity with the reference's `parse_args` (utils.py:250-266):
`--config path/to.yaml` is the single CLI flag, every YAML key becomes a
Trainer/Tester kwarg, and the resolved config is pretty-printed as a table
at startup. Adds `key=value` CLI overrides (absent in the reference but
standard for a framework) and schema-free attribute access with defaults.
"""
from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import yaml

from diff_unet_tpu.utils.logging import format_table


class Config(dict):
    """Dict with attribute access; missing keys raise with the config path."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get_path(self) -> Optional[str]:
        return self.get("__config_path__")


def _coerce(value: Any) -> Any:
    """Parse a scalar using YAML rules, plus scientific-notation floats
    (YAML 1.1 reads `1e-3` as a string; the reference papers over this with
    float() casts at use sites, e.g. train.py:96,121)."""
    v = yaml.safe_load(value) if isinstance(value, str) else value
    if isinstance(v, str):
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            return v
    return v


def load_config(path, overrides: Optional[Sequence[str]] = None) -> Config:
    path = Path(path)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config({k: _coerce(v) for k, v in raw.items()})
    cfg["__config_path__"] = str(path)
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        key, value = item.split("=", 1)
        cfg[key] = _coerce(value)
    return cfg


def parse_args(argv: Optional[Sequence[str]] = None,
               quiet: bool = False) -> Config:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the YAML configuration file")
    parser.add_argument("overrides", nargs="*",
                        help="key=value config overrides")
    args = parser.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    if not quiet:
        rows = [(k, v) for k, v in cfg.items() if not k.startswith("__")]
        print(format_table(["Argument", "Value"], rows))
    return cfg
