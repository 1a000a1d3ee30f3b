"""Leveled logging for the framework (VERDICT r3: replaces bare prints).

One shared ``drba_tpu`` logger hierarchy; handler/format configured once on
first use, level via ``DRBA_LOG_LEVEL`` (default INFO). Child loggers keep
the module origin in the record (``drba_tpu.convert`` etc.) so production
runs can filter per subsystem. Progress bars (tqdm) stay on stderr and are
not routed through here — they are UI, not logs.
"""

from __future__ import annotations

import logging
import os
import sys

_CONFIGURED = False


def get_logger(name: str = "drba_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        root = logging.getLogger("drba_tpu")
        if not root.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter(
                "%(asctime)s %(levelname).1s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            ))
            root.addHandler(h)
        root.setLevel(os.environ.get("DRBA_LOG_LEVEL", "INFO").upper())
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)
