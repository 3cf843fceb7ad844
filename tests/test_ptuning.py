"""Prompt-tuning (virtual token) embedding + serving path.

Reference: tensorrt_llm/layers/embedding.py:38-80 PromptTuningEmbedding and
the GenerationSession prompt inputs (tensorrt_llm/runtime/generation.py:
501-524, 786 — prompt_embedding_table / tasks / prompt_vocab_size). The
reference flattens task pages into one buffer and offsets ids by
tasks * task_vocab_size; equivalence against exactly that flattening is
asserted below via an extended-vocab twin model.
"""

import dataclasses

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_prompt_tuning_embedding_op(rng):
    """Virtual ids gather from the task page, normal ids from the table."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.ops.functional import prompt_tuning_embedding

    vocab, task_vocab, num_tasks, d = 11, 3, 2, 4
    table = rng.standard_normal((vocab, d)).astype(np.float32)
    ptable = rng.standard_normal((num_tasks, task_vocab, d)).astype(np.float32)
    ids = np.array([[0, 10, vocab + 2, vocab + 0],
                    [5, vocab + 1, 1, vocab + 2]], np.int32)
    tasks = np.array([1, 0], np.int32)

    out = np.asarray(prompt_tuning_embedding(
        jnp.asarray(table), jnp.asarray(ptable), jnp.asarray(ids),
        jnp.asarray(tasks)))

    expect = np.empty((2, 4, d), np.float32)
    for b in range(2):
        for s in range(4):
            i = ids[b, s]
            expect[b, s] = table[i] if i < vocab else ptable[tasks[b], i - vocab]
    np.testing.assert_array_equal(out, expect)


def _setup_models(rng):
    """(params, cfg) plus an extended-vocab twin whose wte appends the
    flattened prompt table — the reference's concatenated-table layout."""
    import jax
    import jax.numpy as jnp

    from whisper_trtllm_tpu.models.gpt.model import GPTConfig, init_params

    cfg = GPTConfig.testing()
    params = init_params(cfg, seed=0)
    num_tasks, task_vocab = 3, 4
    ptable = rng.standard_normal(
        (num_tasks, task_vocab, cfg.d_model)).astype(np.float32)

    ext_cfg = dataclasses.replace(
        cfg, vocab_size=cfg.vocab_size + num_tasks * task_vocab)
    ext_params = dict(params)
    ext_params["wte"] = np.concatenate(
        [params["wte"], ptable.reshape(-1, cfg.d_model)], 0)

    ids = rng.integers(0, cfg.vocab_size, (2, 6)).astype(np.int32)
    # rows 0/1 use tasks 2/0; positions 1 and 3 are virtual
    tasks = np.array([2, 0], np.int32)
    ids[:, 1] = cfg.vocab_size + 1
    ids[:, 3] = cfg.vocab_size + 3
    ext_ids = ids.copy()
    for b in range(2):
        virt = ids[b] >= cfg.vocab_size
        ext_ids[b, virt] = (cfg.vocab_size + tasks[b] * task_vocab
                            + ids[b, virt] - cfg.vocab_size)
    return (cfg, params, ext_cfg, ext_params, ptable, ids, ext_ids, tasks,
            jax, jnp)


def test_forward_matches_extended_vocab_twin(rng):
    """forward(ptuning) hidden path is exactly the extended-vocab model's;
    logits over the real vocab columns agree to fp32 tolerance (the head
    contraction tiles differently at 89- vs 101-row vocab, so bit-equality
    stops at the final einsum)."""
    (cfg, params, ext_cfg, ext_params, ptable, ids, ext_ids, tasks,
     jax, jnp) = _setup_models(rng)
    from whisper_trtllm_tpu.models.gpt.model import forward

    out = np.asarray(jax.jit(
        lambda p, t, pt, tk: forward(p, cfg, t, ptuning=(pt, tk))
    )(params, ids, ptable, tasks))
    ref = np.asarray(jax.jit(
        lambda p, t: forward(p, ext_cfg, t)
    )(ext_params, ext_ids))
    np.testing.assert_allclose(out, ref[..., : cfg.vocab_size],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(out.argmax(-1),
                                  ref[..., : cfg.vocab_size].argmax(-1))


def test_generate_ptuning_matches_teacher_forced(rng):
    """Cached generate over a virtual-token prompt equals a manual greedy
    loop that re-runs the teacher-forced forward each step (the
    cached-vs-full invariant, with the prompt table in play)."""
    (cfg, params, _, _, ptable, ids, _, tasks, jax, jnp) = _setup_models(rng)
    import whisper_trtllm_tpu.models.gpt.model as gpt

    cfg = dataclasses.replace(cfg, eos_token_id=-1)
    new = 5
    out = np.asarray(gpt.generate_ptuning(params, cfg, jnp.asarray(ids),
                                          ptable, tasks, max_new_tokens=new))
    assert out.shape == (2, ids.shape[1] + new)
    np.testing.assert_array_equal(out[:, : ids.shape[1]], ids)

    fwd = jax.jit(lambda p, t, pt, tk: gpt.forward(p, cfg, t,
                                                   ptuning=(pt, tk)))
    cur = ids
    for _ in range(new):
        logits = np.asarray(fwd(params, jnp.asarray(cur), ptable, tasks))
        nxt = logits[:, -1].argmax(-1).astype(np.int32)
        cur = np.concatenate([cur, nxt[:, None]], 1)
    np.testing.assert_array_equal(out, cur)
