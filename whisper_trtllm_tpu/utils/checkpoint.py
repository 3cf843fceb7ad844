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
from typing import Optional, Tuple

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


def save_sharded(path: str, params: dict) -> None:
    """Sharded checkpoint via orbax (multi-host safe: each host writes its
    shards). Use for TP/DP-sharded trees; the msgpack path above is the
    single-host artifact."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params)


def load_sharded(path: str, target: Optional[dict] = None,
                 shardings: Optional[dict] = None) -> dict:
    """Restore an orbax checkpoint; with ``shardings`` (a tree of
    jax.sharding.Sharding) arrays land directly on devices in the right
    layout (no host-memory spike)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if shardings is not None:
        restore_args = jax.tree_util.tree_map(
            lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings,
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return ckptr.restore(
            os.path.abspath(path),
            restore_args=restore_args,
        )
    return ckptr.restore(os.path.abspath(path))
