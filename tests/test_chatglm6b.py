"""ChatGLM-6B zoo model (2D RoPE, GLM scaled post-LN residual, prefix-LM
mask) vs a torch reference implementing the reference repo's semantics
(analog of reference: tensorrt_llm/models/chatglm6b/model.py; torch twin in
the style of its tests/functional/torch_ref.py — the baked-in transformers
has no ChatGLM-6B, it is a trust_remote_code model)."""

import jax
import numpy as np
import pytest
import torch

from whisper_trtllm_tpu.models.chatglm6b import (
    ChatGLM6BConfig,
    build_position_ids,
    convert_hf_chatglm6b,
    forward,
)


def _torch_glm_forward(sd, cfg, tokens, position_ids, ctx_len):
    """Readable torch twin of ChatGLM-6B with original state-dict keys
    (GLM residual alpha, 2D neox-style RoPE per half, prefix-LM mask)."""
    th = {k: torch.from_numpy(np.asarray(v)).double() for k, v in sd.items()}
    b, s = tokens.shape
    h, dh = cfg.n_head, cfg.head_dim
    alpha = (2.0 * cfg.n_layer) ** 0.5

    def ln(p, x):
        return torch.nn.functional.layer_norm(
            x, (cfg.d_model,), th[p + ".weight"], th[p + ".bias"])

    def rope_half(x, pos, half):
        # x (B, H, S, half); neox rotate_half within `half` dims
        inv = 1.0 / (10000.0 ** (torch.arange(0, half, 2).double() / half))
        ang = pos.double()[:, :, None] * inv          # (B, S, half/2)
        emb = torch.cat([ang, ang], dim=-1)           # (B, S, half)
        cos, sin = emb.cos()[:, None], emb.sin()[:, None]
        x1, x2 = x[..., : half // 2], x[..., half // 2:]
        rot = torch.cat([-x2, x1], dim=-1)
        return x * cos + rot * sin

    x = th["transformer.word_embeddings.weight"][
        torch.from_numpy(tokens).long()]
    q_pos = torch.arange(s)[:, None]
    k_pos = torch.arange(s)[None, :]
    allowed = (k_pos < ctx_len) | (k_pos <= q_pos)

    for i in range(cfg.n_layer):
        p = f"transformer.layers.{i}"
        hx = ln(p + ".input_layernorm", x)
        qkv = hx @ th[p + ".attention.query_key_value.weight"].T \
            + th[p + ".attention.query_key_value.bias"]
        qkv = qkv.view(b, s, h, 3, dh)
        q, k, v = (qkv[..., j, :].permute(0, 2, 1, 3) for j in range(3))
        half = dh // 2
        pos0 = torch.from_numpy(position_ids[:, 0])
        pos1 = torch.from_numpy(position_ids[:, 1])
        q = torch.cat([rope_half(q[..., :half], pos0, half),
                       rope_half(q[..., half:], pos1, half)], dim=-1)
        k = torch.cat([rope_half(k[..., :half], pos0, half),
                       rope_half(k[..., half:], pos1, half)], dim=-1)
        scores = (q @ k.transpose(-1, -2)) / dh ** 0.5
        scores = scores.masked_fill(~allowed[None, None], -1e9)
        a = torch.softmax(scores, dim=-1) @ v
        a = a.permute(0, 2, 1, 3).reshape(b, s, cfg.d_model)
        a = a @ th[p + ".attention.dense.weight"].T \
            + th[p + ".attention.dense.bias"]
        x = hx * alpha + a
        hx = ln(p + ".post_attention_layernorm", x)
        m = hx @ th[p + ".mlp.dense_h_to_4h.weight"].T \
            + th[p + ".mlp.dense_h_to_4h.bias"]
        m = torch.nn.functional.gelu(m)
        m = m @ th[p + ".mlp.dense_4h_to_h.weight"].T \
            + th[p + ".mlp.dense_4h_to_h.bias"]
        x = hx * alpha + m
    x = ln("transformer.final_layernorm", x)
    return (x @ th["lm_head.weight"].T).float().numpy()


@pytest.fixture(scope="module")
def glm_pair():
    cfg = ChatGLM6BConfig.testing(n_head=2, d_model=16)  # dh=8 → quarters of 4
    rng = np.random.default_rng(0)
    d, f, v = cfg.d_model, cfg.ffn_dim, cfg.vocab_size
    sd = {"transformer.word_embeddings.weight":
          rng.normal(0, 0.02, (v, d)).astype(np.float32),
          "transformer.final_layernorm.weight":
          rng.normal(1, 0.02, (d,)).astype(np.float32),
          "transformer.final_layernorm.bias":
          rng.normal(0, 0.02, (d,)).astype(np.float32),
          "lm_head.weight": rng.normal(0, 0.02, (v, d)).astype(np.float32)}
    for i in range(cfg.n_layer):
        p = f"transformer.layers.{i}"
        for name, shape in [
            (".input_layernorm.weight", (d,)), (".input_layernorm.bias", (d,)),
            (".attention.query_key_value.weight", (3 * d, d)),
            (".attention.query_key_value.bias", (3 * d,)),
            (".attention.dense.weight", (d, d)),
            (".attention.dense.bias", (d,)),
            (".post_attention_layernorm.weight", (d,)),
            (".post_attention_layernorm.bias", (d,)),
            (".mlp.dense_h_to_4h.weight", (f, d)),
            (".mlp.dense_h_to_4h.bias", (f,)),
            (".mlp.dense_4h_to_h.weight", (d, f)),
            (".mlp.dense_4h_to_h.bias", (d,)),
        ]:
            sd[p + name] = rng.normal(0, 0.05, shape).astype(np.float32)
    params = convert_hf_chatglm6b(sd, cfg)
    return sd, params, cfg


def test_forward_parity(glm_pair, rng):
    sd, params, cfg = glm_pair
    b, s, ctx = 2, 10, 6
    tokens = rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)
    pos = np.stack([build_position_ids(s, mask_pos=ctx - 1, ctx_len=ctx)] * b)
    ours = np.asarray(jax.jit(
        lambda p, t, pi: forward(p, cfg, t, pi, ctx_len=ctx)
    )(params, tokens, pos))
    theirs = _torch_glm_forward(sd, cfg, tokens, pos, ctx)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_prefix_mask_sees_future_prompt(glm_pair, rng):
    """Prefix-LM semantics: changing a *later prompt* token changes logits of
    an earlier prompt position (bidirectional over the prompt), while
    changing a generated-region token never affects earlier positions."""
    sd, params, cfg = glm_pair
    s, ctx = 10, 6
    tokens = rng.integers(0, cfg.vocab_size, (1, s)).astype(np.int32)
    pos = build_position_ids(s, mask_pos=ctx - 1, ctx_len=ctx)[None]
    fn = jax.jit(lambda p, t, pi: forward(p, cfg, t, pi, ctx_len=ctx))
    base = np.asarray(fn(params, tokens, pos))
    t2 = tokens.copy()
    t2[0, ctx - 1] = (t2[0, ctx - 1] + 1) % cfg.vocab_size
    changed = np.asarray(fn(params, t2, pos))
    assert np.abs(changed[0, 0] - base[0, 0]).max() > 1e-6
    t3 = tokens.copy()
    t3[0, s - 1] = (t3[0, s - 1] + 1) % cfg.vocab_size
    causal = np.asarray(fn(params, t3, pos))
    np.testing.assert_allclose(causal[0, : s - 1], base[0, : s - 1],
                               atol=1e-6)


def test_position_ids():
    pos = build_position_ids(8, mask_pos=3, ctx_len=5)
    np.testing.assert_array_equal(pos[0], [0, 1, 2, 3, 4, 3, 3, 3])
    np.testing.assert_array_equal(pos[1], [0, 0, 0, 0, 0, 1, 2, 3])


def test_cached_generate_matches_teacher_forced(glm_pair, rng):
    """Cached prefill+step generation (2D-rope positions per step, the
    analog of the reference's ChatGLM6BHeadModelGenerationSession,
    reference: tensorrt_llm/runtime/generation.py:1000) is token-exact vs
    a greedy loop over the teacher-forced forward."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.models.chatglm6b import generate

    _, params, cfg = glm_pair
    ctx = 5
    mask_pos = ctx - 2
    new = 6
    prompt = rng.integers(3, cfg.vocab_size, (2, ctx)).astype(np.int32)

    # reference loop: re-run the full prefix-LM forward each step
    seq = prompt
    for _ in range(new):
        s = seq.shape[1]
        pos_ids = np.broadcast_to(
            build_position_ids(s, mask_pos, ctx)[None], (2, 2, s))
        logits = np.asarray(
            forward(params, cfg, seq, jnp.asarray(pos_ids), ctx))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)

    ours = np.asarray(
        generate(params, cfg, prompt, max_new_tokens=new, mask_pos=mask_pos))
    # rows may hit EOS in ours (post-EOS positions hold eos); compare to the
    # same convention in the reference loop
    eos = cfg.eos_token_id
    for b in range(seq.shape[0]):
        row_ref, row_ours = seq[b], ours[b]
        done = False
        for t in range(ctx, seq.shape[1]):
            if done:
                assert row_ours[t] == eos
            else:
                assert row_ours[t] == row_ref[t]
                done = row_ref[t] == eos
