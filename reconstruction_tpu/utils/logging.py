"""Structured logging + per-stage scalar stats.

Upgrades the reference's printf/Verbose-gate telemetry
(`CStereoMatching.cpp:12,38-39`, `CCloudOptimization.cpp:98-99`) to a
structured log: per-stage valid-pixel fractions, point counts and timings
(SURVEY.md section 5 "metrics/observability").
"""

from __future__ import annotations

import json
import logging
import sys
from dataclasses import dataclass, field
from typing import Any, Dict, List

_LOGGERS: Dict[str, logging.Logger] = {}


def get_logger(name: str = "reconstruction_tpu") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    _LOGGERS[name] = logger
    return logger


@dataclass
class StageStats:
    """Accumulates per-stage scalars; dumpable as one JSON line per stage."""

    records: List[Dict[str, Any]] = field(default_factory=list)

    def add(self, stage: str, **scalars: Any) -> None:
        rec = {"stage": stage}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "item") else v
        self.records.append(rec)

    def dump(self) -> str:
        return "\n".join(json.dumps(r) for r in self.records)
