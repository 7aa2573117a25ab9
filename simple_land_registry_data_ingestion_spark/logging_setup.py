"""Process-named structured logging (reference logging.py re-expressed).

Same shape as the reference's logger factory (reference
lib_land_registry_data/logging.py:28-81): a named logger with a stdout
handler at INFO and an optional file handler at DEBUG, format
``name: time | level | file:line | msg``.  Driver-side only; executor-side
logs go through Spark's own log4j.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(name)s: %(asctime)s | %(levelname)s | %(filename)s:%(lineno)s | %(message)s"


def get_logger(process_name: str, log_file: str | None = None) -> logging.Logger:
    logger = logging.getLogger(process_name)
    if logger.handlers:  # idempotent: reuse an already-configured logger
        return logger
    logger.setLevel(logging.DEBUG)
    formatter = logging.Formatter(_FORMAT)

    stdout_handler = logging.StreamHandler(sys.stdout)
    stdout_handler.setLevel(logging.INFO)
    stdout_handler.setFormatter(formatter)
    logger.addHandler(stdout_handler)

    if log_file is not None:
        file_handler = logging.FileHandler(log_file)
        file_handler.setLevel(logging.DEBUG)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    return logger
