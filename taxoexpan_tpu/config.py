"""JSON config system with typed CLI path-overrides and run-dir management.

Re-implements parse_config.py (ConfigParser): load a JSON config tree, apply
CLI overrides declared as (flags, type, config-path) tuples
(parse_config.py:90-109), create timestamped save/log dirs
(parse_config.py:33-44), snapshot the merged config into the run dir (:47),
and on --resume re-read the config.json stored next to the checkpoint
(:20-22).

Component construction is explicit factory functions (build_model / loaders /
optimizer in the CLI scripts) instead of the reference's reflection
`getattr(module, cfg['type'])(...)` (parse_config.py:57-64) — same config
surface, no dynamic attribute lookup.
"""
from __future__ import annotations

import logging
from datetime import datetime
from functools import reduce
from operator import getitem
from pathlib import Path

from .utils import ensure_dir, get_logger, read_json, setup_logging, write_json


class CustomArg:
    """One CLI override mapped to a config-tree path (train.py:58-86)."""

    def __init__(self, flags: list[str], type, target):
        self.flags = flags
        self.type = type
        if isinstance(target, str):
            target = tuple(int(t) if t.isdigit() else t
                           for t in target.split(";"))
        self.target = tuple(target)

    @property
    def dest(self) -> str:
        # argparse derives dest from the FIRST long option string
        return self.flags[0].lstrip("-").replace("-", "_")


class ConfigParser:
    def __init__(self, args, options: list[CustomArg] = (), timestamp=True):
        """`args` is an argparse.ArgumentParser; `options` extra overrides."""
        for opt in options:
            args.add_argument(*opt.flags, default=None, type=opt.type)
        if not isinstance(args, tuple):
            args = args.parse_args()
        self.args = args  # parsed CLI namespace (distributed flags etc.)

        self.resume = None
        if getattr(args, "device", None):
            self._select_device(args.device)
        if getattr(args, "resume", None):
            self.resume = Path(args.resume)
            cfg_fname = self.resume.parent / "config.json"
            if getattr(args, "config", None):
                cfg_fname = Path(args.config)
        else:
            if not getattr(args, "config", None):
                raise ValueError(
                    "Configuration file need to be specified. "
                    "Add '-c config.json', for example.")
            cfg_fname = Path(args.config)

        self._config = read_json(cfg_fname)
        # apply path overrides
        modification = {opt.target: getattr(args, opt.dest)
                        for opt in options}
        for path, value in modification.items():
            if value is not None:
                _set_by_path(self._config, path, value)

        save_root = Path(self.config.get("trainer", {}).get("save_dir",
                                                            "saved/"))
        exper_name = self.config.get("name", "run")
        ts = datetime.now().strftime(r"%m%d_%H%M%S") if timestamp else ""
        self._save_dir = save_root / "models" / exper_name / ts
        self._log_dir = save_root / "log" / exper_name / ts
        ensure_dir(self._save_dir)
        ensure_dir(self._log_dir)
        write_json(self._config, self._save_dir / "config.json")
        setup_logging(self._log_dir)

    @staticmethod
    def _select_device(device: str) -> None:
        """`--device cpu|tpu|axon` chooses the JAX platform (the analog of the
        reference's CUDA_VISIBLE_DEVICES pinning, parse_config.py:18-19)."""
        import jax
        if device == "tpu":
            device = "axon" if _axon_available() else "tpu"
        jax.config.update("jax_platforms", device)

    # ------------------------------------------------------------- accessors
    def __getitem__(self, name):
        return self._config[name]

    def get(self, name, default=None):
        return self._config.get(name, default)

    def __contains__(self, name):
        return name in self._config

    @property
    def config(self):
        return self._config

    @property
    def save_dir(self) -> Path:
        return self._save_dir

    @property
    def log_dir(self) -> Path:
        return self._log_dir

    def get_logger(self, name, verbosity=2) -> logging.Logger:
        return get_logger(name, verbosity)


def _axon_available() -> bool:
    import os
    return os.environ.get("JAX_PLATFORMS", "") == "axon" or \
        os.environ.get("PALLAS_AXON_POOL_IPS") is not None


def _set_by_path(tree, keys, value):
    """Set a value in a nested dict by a sequence of keys
    (parse_config.py:98-109)."""
    _get_by_path(tree, keys[:-1])[keys[-1]] = value


def _get_by_path(tree, keys):
    return reduce(getitem, keys, tree)
