"""Checkpoint save/load for parameter trees + configs.

Analog of the reference's engine/config artifacts
(reference: examples/whisper/build_encoder.py:14-21,44-45,109 — serialized
.engine + config.pkl). Here the artifact pair is a msgpack weight snapshot
(flax.serialization) + a JSON config; the "compiled engine" role is played by
the JAX persistent compilation cache (RuntimeConfig.persistent_cache_dir).
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax
import numpy as np

from whisper_trtllm_tpu.config import WhisperConfig


def save_checkpoint(path: str, params: dict, cfg: WhisperConfig) -> None:
    """Write <path>/params.msgpack + <path>/config.json."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    host_params = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(host_params))
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())


def load_checkpoint(path: str) -> Tuple[dict, WhisperConfig]:
    from flax import serialization

    with open(os.path.join(path, "config.json")) as f:
        cfg = WhisperConfig.from_json(f.read())
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    return params, cfg


def init_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache — the analog of the reference's
    TRT timing cache + serialized engines (reference:
    tensorrt_llm/builder.py:118-136,240-257). Compiles survive process
    restarts, so 'engine build' happens once per (model, shape, topology)."""
    from jax.experimental.compilation_cache import compilation_cache as cc

    os.makedirs(cache_dir, exist_ok=True)
    cc.set_cache_dir(cache_dir)
