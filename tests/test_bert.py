"""BERT zoo model parity vs HF on tiny random configs
(analog of reference: tests/model/test_bert.py)."""

import jax
import numpy as np
import pytest

from whisper_trtllm_tpu.models.bert import convert_hf_bert, forward


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=97, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=24, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = BertModel(hf_cfg).eval()
    params, cfg = convert_hf_bert(hf)
    return hf, params, cfg


def test_forward_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
    seq, pooled = jax.jit(lambda p, t: forward(p, cfg, t))(params, tokens)
    with torch.no_grad():
        out = hf(torch.from_numpy(tokens.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=5e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=5e-5, rtol=1e-4
    )


def test_attention_mask_parity(hf_pair, rng):
    import torch

    hf, params, cfg = hf_pair
    tokens = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[0, 8:] = 0
    mask[1, 5:] = 0
    seq, _ = jax.jit(lambda p, t, m: forward(p, cfg, t, m))(params, tokens, mask)
    with torch.no_grad():
        out = hf(
            torch.from_numpy(tokens.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        )
    ours = np.asarray(seq)
    theirs = out.last_hidden_state.numpy()
    # compare only valid (unmasked) positions
    for b in range(2):
        valid = mask[b].astype(bool)
        np.testing.assert_allclose(ours[b][valid], theirs[b][valid],
                                   atol=5e-5, rtol=1e-4)
