"""Serialized engine artifacts via jax.export.

The reference's build step emits a self-contained ``.engine`` file that the
runtime deserializes and executes without the model-building code
(reference: examples/whisper/build_encoder.py:14-21,109 serialize_engine →
examples/whisper/run.py:61-63 deserialize). The TPU analog is a serialized
StableHLO export of the jitted pipeline: loading it needs jax but not this
package's model code, the traced graph is pinned (same artifact → same
numerics), and XLA recompilation on load is absorbed by the persistent
compilation cache (the timing-cache analog, reference:
tensorrt_llm/builder.py:118-136).

Weights stay an *argument* of the exported function — the engine is
weight-refittable like the reference's (reference:
tensorrt_llm/builder.py:162-201 refit_engine), and one engine serves any
checkpoint of the same architecture.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax


def save_engine(path: str, fn: Callable, *example_args) -> int:
    """Trace+export ``fn`` at the example arguments' shapes/dtypes and write
    the serialized engine. Returns the byte size."""
    from jax import export as jexport

    exp = jexport.export(jax.jit(fn))(*example_args)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


class Engine:
    """A deserialized engine: call it like the original function. The
    underlying computation is the pinned exported graph; jax compiles it
    for the local topology on first call (persistent-cache-warm)."""

    def __init__(self, exported):
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def in_avals(self) -> Sequence:
        return self._exported.in_avals

    def __call__(self, *args):
        return self._call(*args)


def load_engine(path: str) -> Engine:
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return Engine(jexport.deserialize(blob))
