"""Logging (SURVEY.md §5 "Metrics / logging / observability"): stdlib
logging under the ``tinaural`` namespace; quiet by default."""

from __future__ import annotations

import logging


def get_logger(name: str = "tinaural") -> logging.Logger:
    return logging.getLogger(name)


def configure(level: int = logging.INFO) -> None:
    """Opt-in console logging for CLI / debugging sessions."""
    logger = get_logger()
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
    logger.setLevel(level)
