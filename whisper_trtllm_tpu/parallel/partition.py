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


def _adapt_specs_to_quantized(params, specs):
    """Rewrite a spec subtree for weight-only-quantized dense dicts: the
    int8/int4 ``kernel_q``/``kernel_q4`` inherits the float kernel's spec and
    the per-output-channel ``scale`` inherits the kernel's output-dim
    sharding (so a column-parallel projection keeps its scales local)."""
    if not isinstance(params, dict):
        return specs
    if isinstance(params, dict) and "table_q" in params and not isinstance(
        specs, dict
    ):
        # int8-quantized embedding table: both leaves inherit the table spec
        # on their row (vocab) dim; per-row scales follow the same sharding
        return {"table_q": specs, "scale": P(*tuple(specs)[:1])}
    if isinstance(specs, dict) and "kernel" in specs and (
        "kernel_q" in params or "kernel_q4" in params
    ):
        kspec = specs["kernel"]
        # scale shape = kernel shape minus the input dim (second-to-last)
        parts = tuple(kspec)
        scale_spec = P(*(parts[:-2] + parts[-1:])) if len(parts) >= 2 else P()
        out = {
            ("kernel_q" if "kernel_q" in params else "kernel_q4"): kspec,
            "scale": scale_spec,
        }
        if "bias" in params and "bias" in specs:
            out["bias"] = specs["bias"]
        return out
    if isinstance(specs, dict):
        return {
            k: _adapt_specs_to_quantized(params.get(k), v)
            for k, v in specs.items()
            if k in params
        }
    return specs


def gpt_partition_specs() -> dict:
    """PartitionSpec tree for models.gpt trees — the reference applies
    ColumnLinear/RowLinear TP to every zoo family, not just Whisper
    (reference: tensorrt_llm/models/gpt/model.py uses the same TP layers;
    per-rank engines examples/gpt/build.py:24-25). The fused QKV kernel
    shards on its output dim: XLA's SPMD partitioner keeps the global
    semantics regardless of which q/k/v columns land on which device."""
    col = {"kernel": P(None, None, "model"), "bias": P(None, "model")}
    row = {"kernel": P(None, "model", None), "bias": P(None)}
    return {
        "wte": P(),                    # replicated: tied vocab head
        "wpe": P(),
        "layers": {
            "ln_1": _ln_spec(),
            "attn_qkv": dict(col),
            "attn_out": row,
            "ln_2": _ln_spec(),
            "fc_in": dict(col),
            "fc_out": dict(row),
        },
        "ln_f": {"scale": P(), "bias": P()},
    }


def llama_partition_specs(tie_word_embeddings: bool = True) -> dict:
    """PartitionSpec tree for models.llama trees (column-shard q/k/v/gate/up
    on output dims — GQA KV heads shard the same way — row-shard o/down)."""
    col = {"kernel": P(None, None, "model")}
    row = {"kernel": P(None, "model", None)}
    norm = {"scale": P(None, None)}
    spec = {
        "embed_tokens": P(),
        "layers": {
            "input_norm": norm,
            "q": dict(col), "k": dict(col), "v": dict(col), "o": row,
            "post_norm": norm,
            "gate": dict(col), "up": dict(col), "down": dict(row),
        },
        "norm": {"scale": P()},
    }
    if not tie_word_embeddings:
        spec["lm_head"] = {"kernel": P(None, "model")}
    return spec


def shard_zoo_params(params: dict, mesh: Mesh, family: str) -> dict:
    """shard_params for a zoo tree by family name ('gpt' or 'llama')."""
    if family == "gpt":
        specs = gpt_partition_specs()
    elif family == "llama":
        specs = llama_partition_specs("lm_head" not in params)
        if "lm_head" in params:
            vocab = params["lm_head"]["kernel"].shape[-1]
            if vocab % mesh.shape.get("model", 1) != 0:
                # the reference pads the vocab to make it divisible
                # (pad_vocab_size, tensorrt_llm/_utils.py:194); replicating
                # the head is the padding-free equivalent
                specs["lm_head"] = {"kernel": P()}
    else:
        raise ValueError(f"no partition specs for family {family!r}")
    return shard_params(params, mesh, specs)


def shard_params(params: dict, mesh: Mesh, specs: Optional[dict] = None) -> dict:
    """device_put the tree with NamedShardings (the 'engine load' step of a
    TP deployment — replaces per-rank engine files, reference:
    examples/gpt/build.py:24-25). Handles fused-QKV and weight-only-quantized
    trees (specs are adapted to kernel_q/kernel_q4 + scale leaves)."""
    if specs is None:
        fused = "qkv" in params.get("decoder", {}).get("layers", {}).get(
            "self_attn", {})
        specs = param_partition_specs(fused_qkv=fused)
    specs = _adapt_specs_to_quantized(params, specs)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, dict),
    )
