"""Device mesh construction (analog of Mapping + MPI world bootstrap,
reference: tensorrt_llm/mapping.py:4-14, tensorrt_llm/_utils.py:181-191).

The reference's world is TP-only (`tp_size = world_size`) and driven by
mpirun; here a 2-D ('data', 'model') mesh is laid out so that 'model'
(tensor-parallel) collectives ride ICI and 'data' spans hosts/DCN, per
SURVEY.md §2d. Multi-host bootstrap is `jax.distributed.initialize` —
no MPI, no NCCL plugin: collectives are jnp ops inside jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from whisper_trtllm_tpu.config import MeshConfig


def make_mesh(
    mesh_cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    With `mesh_cfg=None`, all visible devices go to the 'data' axis
    (pure DP). 'model' is placed as the *minor* (fastest-varying) axis so
    TP neighbors are ICI-adjacent under the default device order.
    """
    devices = list(devices if devices is not None else jax.devices())
    cfg = mesh_cfg or MeshConfig(data=len(devices), model=1)
    if cfg.world_size != len(devices):
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {cfg.world_size} devices, "
            f"got {len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(
            (cfg.data, cfg.model), devices=devices
        )
    except Exception:  # CPU/host platforms without topology info
        dev_array = np.asarray(devices).reshape(cfg.data, cfg.model)
    return Mesh(dev_array, axis_names=("data", "model"))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (call once per process on multi-host slices).
    Replaces the reference's mpirun/MPI world (reference:
    docs/architecture.md:238-249)."""
    jax.distributed.initialize(**kwargs)


def check_devices(mesh: Optional[Mesh] = None) -> dict:
    """Startup health check: run a tiny psum over every device and verify
    the result (SURVEY.md §5 failure-detection row: the reference has only
    assert-and-abort; this is the clean multi-host startup check). Returns
    {'devices': N, 'ok': bool}."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or make_mesh()
    n = mesh.size
    x = jax.device_put(
        np.ones((n, 1), np.float32),
        NamedSharding(mesh, P(mesh.axis_names[0] if mesh.shape[mesh.axis_names[0]] == n else None)),
    )

    def fn(x):
        return jnp.sum(x)

    with mesh:
        total = float(jax.jit(fn)(x))
    return {"devices": n, "ok": abs(total - n) < 1e-6}
