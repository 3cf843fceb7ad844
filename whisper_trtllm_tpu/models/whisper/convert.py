"""HF Whisper checkpoint → whisper_trtllm_tpu parameter tree.

Analog of the reference's per-tensor weight binding at engine-build time
(reference: examples/whisper/build_encoder.py:72-91 and
build_decoder.py:74-101). Torch Linear weights (out, in) are transposed to
(in, out) kernels; Conv1d weights (out, in, k) become (k, in, out); per-layer
tensors are stacked along a leading L axis for ``lax.scan``.

Works from either a live ``WhisperForConditionalGeneration`` (torch, CPU) or
a raw state dict of numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from whisper_trtllm_tpu.config import WhisperConfig


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _dense(sd: Dict[str, Any], prefix: str) -> dict:
    p = {"kernel": np.ascontiguousarray(_np(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def _ln(sd: Dict[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _attn(sd: Dict[str, Any], prefix: str) -> dict:
    return {
        "q": _dense(sd, prefix + ".q_proj"),
        "k": _dense(sd, prefix + ".k_proj"),   # bias-free in Whisper
        "v": _dense(sd, prefix + ".v_proj"),
        "out": _dense(sd, prefix + ".out_proj"),
    }


def _conv1d(sd: Dict[str, Any], prefix: str) -> dict:
    w = _np(sd[prefix + ".weight"])  # (out, in, k)
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
        "bias": _np(sd[prefix + ".bias"]),
    }


def _stack(trees: list) -> dict:
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *trees)


def convert_state_dict(sd: Dict[str, Any], cfg: WhisperConfig) -> dict:
    """Raw HF state dict (torch tensors or numpy) → parameter tree."""
    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append({
            "self_attn": _attn(sd, p + ".self_attn"),
            "self_attn_layer_norm": _ln(sd, p + ".self_attn_layer_norm"),
            "fc1": _dense(sd, p + ".fc1"),
            "fc2": _dense(sd, p + ".fc2"),
            "final_layer_norm": _ln(sd, p + ".final_layer_norm"),
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append({
            "self_attn": _attn(sd, p + ".self_attn"),
            "self_attn_layer_norm": _ln(sd, p + ".self_attn_layer_norm"),
            "encoder_attn": _attn(sd, p + ".encoder_attn"),
            "encoder_attn_layer_norm": _ln(sd, p + ".encoder_attn_layer_norm"),
            "fc1": _dense(sd, p + ".fc1"),
            "fc2": _dense(sd, p + ".fc2"),
            "final_layer_norm": _ln(sd, p + ".final_layer_norm"),
        })
    params = {
        "encoder": {
            "conv1": _conv1d(sd, "model.encoder.conv1"),
            "conv2": _conv1d(sd, "model.encoder.conv2"),
            "embed_positions": _np(sd["model.encoder.embed_positions.weight"]),
            "layers": _stack(enc_layers),
            "layer_norm": _ln(sd, "model.encoder.layer_norm"),
        },
        "decoder": {
            # proj_out is tied to embed_tokens (reference:
            # examples/whisper/build_decoder.py:101), so only the table is kept
            "embed_tokens": _np(sd["model.decoder.embed_tokens.weight"]),
            "embed_positions": _np(sd["model.decoder.embed_positions.weight"]),
            "layers": _stack(dec_layers),
            "layer_norm": _ln(sd, "model.decoder.layer_norm"),
        },
    }
    return params


def convert_hf_model(hf_model) -> Tuple[dict, WhisperConfig]:
    """Live transformers WhisperForConditionalGeneration → (params, config)."""
    cfg = WhisperConfig.from_hf(
        hf_model.config, getattr(hf_model, "generation_config", None)
    )
    sd = {k: v for k, v in hf_model.state_dict().items()}
    return convert_state_dict(sd, cfg), cfg


def load_pretrained(name_or_path: str):
    """Load an HF checkpoint from disk/hub and convert.
    (Requires network or a local checkout — offline CI uses random-init
    parity tests instead, mirroring the reference's tiny-config test pattern,
    reference: tests/model/test_gpt.py:47.)"""
    from transformers import WhisperForConditionalGeneration

    hf = WhisperForConditionalGeneration.from_pretrained(name_or_path)
    return convert_hf_model(hf)


def export_state_dict(params: dict, cfg: WhisperConfig) -> Dict[str, np.ndarray]:
    """Inverse of ``convert_state_dict``: parameter tree → HF state-dict
    layout (numpy). Lets a locally fine-tuned checkpoint be written back
    into an HF model dir so the acceptance differential compares the SAME
    weights on both sides (the reference's cross-framework comparison,
    examples/whisper/run.py:294-331, but weight-identical by construction).
    ``proj_out`` stays tied to ``embed_tokens`` (reference:
    examples/whisper/build_decoder.py:101)."""
    def norm(x):
        return np.ascontiguousarray(np.asarray(x, np.float32))

    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, p):
        sd[prefix + ".weight"] = norm(p["kernel"]).T.copy()
        if "bias" in p:
            sd[prefix + ".bias"] = norm(p["bias"])

    def put_ln(prefix, p):
        sd[prefix + ".weight"] = norm(p["scale"])
        sd[prefix + ".bias"] = norm(p["bias"])

    def put_attn(prefix, p):
        put_dense(prefix + ".q_proj", p["q"])
        put_dense(prefix + ".k_proj", p["k"])
        put_dense(prefix + ".v_proj", p["v"])
        put_dense(prefix + ".out_proj", p["out"])

    def put_conv1d(prefix, p):
        sd[prefix + ".weight"] = norm(p["kernel"]).transpose(2, 1, 0).copy()
        sd[prefix + ".bias"] = norm(p["bias"])

    import jax

    enc, dec = params["encoder"], params["decoder"]
    put_conv1d("model.encoder.conv1", enc["conv1"])
    put_conv1d("model.encoder.conv2", enc["conv2"])
    sd["model.encoder.embed_positions.weight"] = norm(enc["embed_positions"])
    put_ln("model.encoder.layer_norm", enc["layer_norm"])
    for i in range(cfg.encoder_layers):
        lp = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], enc["layers"])
        p = f"model.encoder.layers.{i}"
        put_attn(p + ".self_attn", lp["self_attn"])
        put_ln(p + ".self_attn_layer_norm", lp["self_attn_layer_norm"])
        put_dense(p + ".fc1", lp["fc1"])
        put_dense(p + ".fc2", lp["fc2"])
        put_ln(p + ".final_layer_norm", lp["final_layer_norm"])
    sd["model.decoder.embed_tokens.weight"] = norm(dec["embed_tokens"])
    sd["model.decoder.embed_positions.weight"] = norm(dec["embed_positions"])
    put_ln("model.decoder.layer_norm", dec["layer_norm"])
    for i in range(cfg.decoder_layers):
        lp = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], dec["layers"])
        p = f"model.decoder.layers.{i}"
        put_attn(p + ".self_attn", lp["self_attn"])
        put_ln(p + ".self_attn_layer_norm", lp["self_attn_layer_norm"])
        put_attn(p + ".encoder_attn", lp["encoder_attn"])
        put_ln(p + ".encoder_attn_layer_norm", lp["encoder_attn_layer_norm"])
        put_dense(p + ".fc1", lp["fc1"])
        put_dense(p + ".fc2", lp["fc2"])
        put_ln(p + ".final_layer_norm", lp["final_layer_norm"])
    return sd
