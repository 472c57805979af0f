"""Structured logging for the transcode runtime.

The reference scatters fprintf(stderr, ...) through its shims (SURVEY.md §5
observability row); here every subsystem logs through one namespaced logger
with a structured key=value formatter so a serving deployment can ship logs
without parsing free text.
"""

from __future__ import annotations

import logging
import os
import sys


class _KVFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        base = (f"ts={self.formatTime(record, '%Y-%m-%dT%H:%M:%S')} "
                f"level={record.levelname.lower()} "
                f"logger={record.name} msg={record.getMessage()!r}")
        extras = getattr(record, "kv", None)
        if extras:
            base += " " + " ".join(f"{k}={v}" for k, v in extras.items())
        return base


_configured = False


def get_logger(name: str = "lilliput") -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_KVFormatter())
        root = logging.getLogger("lilliput")
        root.addHandler(handler)
        root.setLevel(os.environ.get("LILLIPUT_LOG_LEVEL", "WARNING").upper())
        root.propagate = False
        _configured = True
    return logger


def kv(logger: logging.Logger, level: int, msg: str, **fields) -> None:
    logger.log(level, msg, extra={"kv": fields})
