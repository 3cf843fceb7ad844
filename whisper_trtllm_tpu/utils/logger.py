"""Singleton logger with env-var severity override.

Analog of the reference's Logger bridging python-logging/TRT/polygraphy with
``TLLM_LOG_LEVEL`` (reference: tensorrt_llm/logger.py:22-126); here a plain
python logger honoring ``WHISPER_TPU_LOG_LEVEL``.
"""

from __future__ import annotations

import logging
import os

_LEVELS = {
    "verbose": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "internal_error": logging.CRITICAL,
}


def _make_logger() -> logging.Logger:
    lg = logging.getLogger("whisper_trtllm_tpu")
    if not lg.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("[%(asctime)s] [WT-TPU] [%(levelname)s] %(message)s")
        )
        lg.addHandler(h)
    level = os.environ.get("WHISPER_TPU_LOG_LEVEL", "warning").lower()
    lg.setLevel(_LEVELS.get(level, logging.WARNING))
    lg.propagate = False
    return lg


logger = _make_logger()
