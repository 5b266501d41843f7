"""YAML config system.

Equivalent of config/parser.py: loads a YAML config, applies CLI overrides
addressed by ``"a;b;c"`` key paths (parser.py:99-118), creates
``out/models/<experiment>/<runid>`` and ``out/logs/<experiment>/<runid>``
(parser.py:28-42), snapshots the resolved config into the log dir, and
wires logging.
"""
from __future__ import annotations

import argparse
import os
from functools import reduce
from typing import Any, Dict, Optional

import yaml

from ..utils.logger import setup_logging


class ConfigParser:
    def __init__(
        self,
        config: Dict[str, Any],
        run_id: Optional[str] = None,
        resume: Optional[str] = None,
        make_dirs: bool = True,
    ):
        self.config = config
        self.resume = resume
        self.run_id = run_id or "default"

        output = config.get("trainer", {}).get("output_path", "out")
        exper = config.get("experiment", "exp")
        self.save_dir = os.path.join(output, "models", exper, self.run_id)
        self.log_dir = os.path.join(output, "logs", exper, self.run_id)
        if make_dirs:
            os.makedirs(self.save_dir, exist_ok=True)
            os.makedirs(self.log_dir, exist_ok=True)
            with open(os.path.join(self.log_dir, "config.yml"), "w") as f:
                yaml.safe_dump(config, f, default_flow_style=False, sort_keys=False)
            setup_logging(self.log_dir)

    # -------------------------------------------------------------- #

    @classmethod
    def from_yaml(cls, path: str, run_id=None, resume=None, overrides=None, make_dirs=True):
        with open(path) as f:
            config = yaml.safe_load(f)
        for target, value in (overrides or {}).items():
            _set_by_path(config, target, value)
        return cls(config, run_id=run_id, resume=resume, make_dirs=make_dirs)

    @classmethod
    def from_args(cls, argv=None, extra_options=()):
        """CLI: -c/--config, -id/--runid, -r/--resume, --reset, plus
        registered override flags with ';'-separated target paths."""
        p = argparse.ArgumentParser(description="ebfi_tpu trainer")
        p.add_argument("-c", "--config", required=True)
        p.add_argument("-id", "--runid", default=None)
        p.add_argument("-r", "--resume", default=None)
        p.add_argument("--reset", action="store_true")
        for flags, typ, target in extra_options:
            p.add_argument(*flags, default=None, type=typ, dest=_dest(flags))
        args = p.parse_args(argv)
        overrides = {}
        for flags, typ, target in extra_options:
            v = getattr(args, _dest(flags))
            if v is not None:
                overrides[target] = v
        parser = cls.from_yaml(args.config, run_id=args.runid, resume=args.resume,
                               overrides=overrides)
        parser.reset = args.reset
        return parser

    def __getitem__(self, key: str):
        return self.config[key]

    def get(self, key: str, default=None):
        return self.config.get(key, default)


def _dest(flags):
    return flags[-1].lstrip("-").replace("-", "_")


def _set_by_path(tree: dict, path: str, value) -> None:
    keys = path.split(";")
    parent = reduce(lambda d, k: d.setdefault(k, {}), keys[:-1], tree)
    parent[keys[-1]] = value
