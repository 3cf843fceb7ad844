"""BERT-style encoder-only model (zoo breadth).

Analog of the reference's BERT family (reference:
tensorrt_llm/models/bert/model.py, exercised by its bertAttentionPlugin
tests, reference: tests/attention/test_bert_attention.py:36-150): post-LN
blocks, learned word/position/type embeddings, attention-mask support for
padded batches (the ragged-batch case the reference handles via
RaggedTensor + remove-padding plugins — here a plain additive mask, XLA
handles the rest).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.layers.init import init_dense, init_embedding, init_layer_norm
from whisper_trtllm_tpu.ops.attention import mha
from whisper_trtllm_tpu.ops.functional import ACT2FN, dense, embedding, layer_norm


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    d_model: int = 768
    n_layer: int = 12
    n_head: int = 12
    ffn_dim: int = 3072
    activation: str = "gelu"
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @classmethod
    def testing(cls, **overrides) -> "BertConfig":
        kw = dict(vocab_size=97, max_position_embeddings=24, d_model=32,
                  n_layer=2, n_head=4, ffn_dim=64)
        kw.update(overrides)
        return cls(**kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


def _init_layer(rng, cfg: BertConfig) -> dict:
    d = cfg.d_model
    return {
        "q": init_dense(rng, d, d),
        "k": init_dense(rng, d, d),
        "v": init_dense(rng, d, d),
        "attn_out": init_dense(rng, d, d),
        "attn_ln": init_layer_norm(d),
        "fc_in": init_dense(rng, d, cfg.ffn_dim),
        "fc_out": init_dense(rng, cfg.ffn_dim, d),
        "out_ln": init_layer_norm(d),
    }


def init_params(cfg: BertConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    layers = [_init_layer(rng, cfg) for _ in range(cfg.n_layer)]
    return {
        "word_embeddings": init_embedding(rng, cfg.vocab_size, cfg.d_model),
        "position_embeddings": init_embedding(
            rng, cfg.max_position_embeddings, cfg.d_model
        ),
        "token_type_embeddings": init_embedding(
            rng, cfg.type_vocab_size, cfg.d_model
        ),
        "embed_ln": init_layer_norm(cfg.d_model),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "pooler": init_dense(rng, cfg.d_model, cfg.d_model),
    }


def forward(
    params: dict,
    cfg: BertConfig,
    tokens: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tokens (B, S) → (sequence_output (B, S, d), pooled (B, d))."""
    b, s = tokens.shape
    x = embedding(params["word_embeddings"], tokens)
    x = x + params["position_embeddings"][:s][None]
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(tokens)
    x = x + embedding(params["token_type_embeddings"], tt)
    x = layer_norm(params["embed_ln"], x, cfg.layer_norm_eps)

    mask = None
    if attention_mask is not None:
        mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9

    def body(x, lp):
        def heads(t):
            return t.reshape(b, s, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)

        q = heads(dense(lp["q"], x)) * cfg.head_dim ** -0.5
        a = mha(q, heads(dense(lp["k"], x)), heads(dense(lp["v"], x)), mask=mask)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        # post-LN residuals (BERT style)
        x = layer_norm(lp["attn_ln"], x + dense(lp["attn_out"], a),
                       cfg.layer_norm_eps)
        h = dense(lp["fc_out"], ACT2FN[cfg.activation](dense(lp["fc_in"], x)))
        x = layer_norm(lp["out_ln"], x + h, cfg.layer_norm_eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = jnp.tanh(dense(params["pooler"], x[:, 0]))
    return x, pooled


def convert_hf_bert(hf_model) -> Tuple[dict, BertConfig]:
    """transformers BertModel → (params, config)."""
    hc = hf_model.config
    cfg = BertConfig(
        vocab_size=hc.vocab_size,
        max_position_embeddings=hc.max_position_embeddings,
        type_vocab_size=hc.type_vocab_size,
        d_model=hc.hidden_size, n_layer=hc.num_hidden_layers,
        n_head=hc.num_attention_heads, ffn_dim=hc.intermediate_size,
        activation=hc.hidden_act, layer_norm_eps=hc.layer_norm_eps,
    )
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}

    def ln(p):
        return {"scale": sd[p + ".weight"], "bias": sd[p + ".bias"]}

    def lin(p):
        return {"kernel": np.ascontiguousarray(sd[p + ".weight"].T),
                "bias": sd[p + ".bias"]}

    layers = []
    for i in range(cfg.n_layer):
        p = f"encoder.layer.{i}"
        layers.append({
            "q": lin(p + ".attention.self.query"),
            "k": lin(p + ".attention.self.key"),
            "v": lin(p + ".attention.self.value"),
            "attn_out": lin(p + ".attention.output.dense"),
            "attn_ln": ln(p + ".attention.output.LayerNorm"),
            "fc_in": lin(p + ".intermediate.dense"),
            "fc_out": lin(p + ".output.dense"),
            "out_ln": ln(p + ".output.LayerNorm"),
        })
    params = {
        "word_embeddings": sd["embeddings.word_embeddings.weight"],
        "position_embeddings": sd["embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd["embeddings.token_type_embeddings.weight"],
        "embed_ln": ln("embeddings.LayerNorm"),
        "layers": jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *layers),
        "pooler": lin("pooler.dense"),
    }
    return params, cfg
