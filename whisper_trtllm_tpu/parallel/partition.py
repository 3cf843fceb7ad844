"""Parameter partition specs: tensor parallelism as data, not code.

Analog of the reference's ColumnLinear/RowLinear weight sharding + NCCL
collectives (reference: tensorrt_llm/layers/linear.py:51-134,
cpp/tensorrt_llm/plugins/ncclPlugin/allreducePlugin.cpp): a column-parallel
matmul is a kernel sharded on its *output* dim, a row-parallel one on its
*input* dim, and XLA inserts the all-gather/psum on ICI where the reference
inserts plugin nodes. Attention heads shard with the qkv output dim
(head-count division, reference: tensorrt_llm/layers/attention.py:71-73).

Layer params carry a leading stacked-L axis (scan over layers), so every
spec below is prefixed with None for that axis.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _attn_spec(fused: bool = False) -> dict:
    col = {"kernel": P(None, None, "model"), "bias": P(None, "model")}
    col_nobias = {"kernel": P(None, None, "model")}
    row = {"kernel": P(None, "model", None), "bias": P(None)}
    if fused:
        return {"qkv": dict(col), "out": row}
    return {"q": dict(col), "k": col_nobias, "v": dict(col), "out": row}


def _ln_spec() -> dict:
    return {"scale": P(None, None), "bias": P(None, None)}


def _layer_specs(has_cross: bool, fused: bool = False) -> dict:
    spec = {
        "self_attn": _attn_spec(fused),
        "self_attn_layer_norm": _ln_spec(),
        "fc1": {"kernel": P(None, None, "model"), "bias": P(None, "model")},
        "fc2": {"kernel": P(None, "model", None), "bias": P(None)},
        "final_layer_norm": _ln_spec(),
    }
    if has_cross:
        spec["encoder_attn"] = _attn_spec()
        spec["encoder_attn_layer_norm"] = _ln_spec()
    return spec


def param_partition_specs(fused_qkv: bool = False) -> dict:
    """PartitionSpec tree matching models.whisper.init_params' structure
    (``fused_qkv=True`` for trees transformed by fuse_qkv_params)."""
    return {
        "encoder": {
            "conv1": {"kernel": P(), "bias": P()},
            "conv2": {"kernel": P(), "bias": P()},
            "embed_positions": P(),
            "layers": _layer_specs(has_cross=False, fused=fused_qkv),
            "layer_norm": {"scale": P(), "bias": P()},
        },
        "decoder": {
            "embed_tokens": P(),       # replicated: vocab head needs full table
            "embed_positions": P(),
            "layers": _layer_specs(has_cross=True, fused=fused_qkv),
            "layer_norm": {"scale": P(), "bias": P()},
        },
    }


def shard_params(params: dict, mesh: Mesh, specs: Optional[dict] = None) -> dict:
    """device_put the tree with NamedShardings (the 'engine load' step of a
    TP deployment — replaces per-rank engine files, reference:
    examples/gpt/build.py:24-25)."""
    if specs is None:
        fused = "qkv" in params.get("decoder", {}).get("layers", {}).get(
            "self_attn", {})
        specs = param_partition_specs(fused_qkv=fused)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
