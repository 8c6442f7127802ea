"""Logging helpers: per-run file handler + git-hash stamping
(parity: /root/reference/kantts/utils/log.py:5-26)."""

from __future__ import annotations

import logging
import os

from kantts_tpu.utils.config import git_revision_hash


def logging_to_file(log_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
    handler = logging.FileHandler(log_file)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s, %(levelname)-4s [%(filename)s:%(lineno)d] %(message)s",
        datefmt="%Y-%m-%d:%H:%M:%S",
    ))
    logging.getLogger().addHandler(handler)


def stamp_logs() -> None:
    logging.info("git revision hash: %s", git_revision_hash())
