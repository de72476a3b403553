"""Logging setup.

The reference piggybacks on gunicorn's handlers and a LOG_LEVEL env var
(reference main.py:63-66, entrypoint.sh:5). Standalone here: one root
configurator honoring the same env var.
"""

from __future__ import annotations

import logging
import os


def configure_logging(level: str | None = None) -> logging.Logger:
    level = (level or os.environ.get("LOG_LEVEL", "info")).upper()
    requested = getattr(logging, level, logging.INFO)
    # Root floor is INFO: LOG_LEVEL=debug scopes to the app logger only —
    # propagating DEBUG to jax's internal loggers floods the log and adds
    # measurable per-dispatch host overhead on single-core serving hosts.
    # LOG_LEVEL=warning/error still quiets third-party INFO output
    # (root = max(INFO, requested); ADVICE r4).
    logging.basicConfig(
        level=max(logging.INFO, requested),
        format="[%(asctime)s] [%(name)s] [%(levelname)s] %(message)s",
    )
    logger = logging.getLogger("wis_tpu")
    logger.setLevel(requested)
    return logger
