"""Small host-side utilities: json io, timers, logging setup.

Replaces the reference's `utils/util.py` (Timer, read/write_json, ensure_dir —
utils/util.py:8-32) and `logger/logger.py` (setup_logging — logger/logger.py:7-22)
with a single module; no gensim/tensorboardX dependencies.
"""
from __future__ import annotations

import json
import logging
import logging.handlers
import os
import time
from collections import OrderedDict
from pathlib import Path


def ensure_dir(dirname: str | Path) -> Path:
    dirname = Path(dirname)
    dirname.mkdir(parents=True, exist_ok=True)
    return dirname


def read_json(fname: str | Path) -> OrderedDict:
    with open(fname, "rt") as handle:
        return json.load(handle, object_hook=OrderedDict)


def write_json(content, fname: str | Path) -> None:
    with open(fname, "wt") as handle:
        json.dump(content, handle, indent=4, sort_keys=False)


class Timer:
    """Wall-clock timer; reference: utils/util.py:21-32."""

    def __init__(self):
        self.cache = time.time()

    def check(self) -> float:
        now = time.time()
        duration = now - self.cache
        self.cache = now
        return duration

    def reset(self) -> None:
        self.cache = time.time()


def setup_logging(save_dir: str | Path | None = None,
                  default_level: int = logging.INFO) -> None:
    """Console + (optional) rotating-file logging.

    Mirrors the reference's dictConfig setup (logger/logger_config.json:9-31):
    console handler at DEBUG, rotating info.log (10 MB x 20 backups) in the
    run directory.
    """
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    if not any(isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler)
               for h in root.handlers):
        console = logging.StreamHandler()
        console.setLevel(default_level)
        console.setFormatter(logging.Formatter("%(message)s"))
        root.addHandler(console)
    if save_dir is not None:
        ensure_dir(save_dir)
        info_file = os.path.join(str(save_dir), "info.log")
        fh = logging.handlers.RotatingFileHandler(
            info_file, maxBytes=10 * 1024 * 1024, backupCount=20, encoding="utf8")
        fh.setLevel(logging.INFO)
        fh.setFormatter(fmt)
        root.addHandler(fh)


def get_logger(name: str, verbosity: int = 2) -> logging.Logger:
    """Verbosity levels as in the reference config system (parse_config.py:66-75)."""
    levels = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}
    logger = logging.getLogger(name)
    logger.setLevel(levels.get(verbosity, logging.DEBUG))
    return logger


def enable_compile_cache(path: str = "/root/.jax_cache") -> None:
    """Turn on JAX's persistent compilation cache (idempotent, best-effort).

    Cold Pallas compiles through the TPU remote-compile relay take minutes;
    with the cache, repeat CLI invocations (train.py / test_fast.py /
    infer.py / bench.py) of the same shapes start in seconds."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
