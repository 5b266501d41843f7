"""Logging setup and YAML result logging.

Mirrors logger/logger.py:9-23 (console + rotating file via dictConfig) and
myutils/utils.py:218-230 (`Logger_yaml` accumulating dict logger), without
the reference's flush-in-__del__ footgun — call `.flush()` (also invoked on
context exit).
"""
from __future__ import annotations

import logging
import logging.config
import os
from typing import Optional

import yaml


def setup_logging(
    log_dir: Optional[str] = None,
    default_level: int = logging.INFO,
    filename: str = "info.txt",
) -> None:
    handlers: dict = {
        "console": {
            "class": "logging.StreamHandler",
            "level": "DEBUG",
            "formatter": "simple",
            "stream": "ext://sys.stdout",
        }
    }
    root_handlers = ["console"]
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        handlers["info_file_handler"] = {
            "class": "logging.handlers.RotatingFileHandler",
            "level": "INFO",
            "formatter": "datetime",
            "filename": os.path.join(log_dir, filename),
            "maxBytes": 10 * 1024 * 1024,
            "backupCount": 5,
            "encoding": "utf8",
        }
        root_handlers.append("info_file_handler")
    logging.config.dictConfig(
        {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {
                "simple": {"format": "%(message)s"},
                "datetime": {"format": "%(asctime)s - %(name)s - %(levelname)s - %(message)s"},
            },
            "handlers": handlers,
            "root": {"level": default_level, "handlers": root_handlers},
        }
    )


class YamlResultLogger:
    """Accumulate info strings and named dicts; flush to a YAML file."""

    def __init__(self, path: str):
        self.path = path
        self._data: dict = {}
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log_info(self, info: str) -> None:
        self._data.setdefault("info", []).append(info)

    def log_dict(self, d: dict, name: str) -> None:
        self._data[name] = _to_plain(d)

    def flush(self) -> None:
        with open(self.path, "w") as f:
            yaml.safe_dump(self._data, f, default_flow_style=False, sort_keys=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()


def _to_plain(obj):
    """Recursively convert numpy/jax scalars for yaml.safe_dump."""
    import numpy as np

    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "item") and getattr(obj, "shape", None) == ():
        return obj.item()
    return obj
