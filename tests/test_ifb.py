"""In-flight batching: per-utterance results must equal lockstep greedy
decode exactly, even when lanes hold utterances at different stages."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
from whisper_trtllm_tpu.runtime.ifb import InflightBatcher


@pytest.fixture(scope="module")
def setup(rng=None):
    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    return cfg, params


def test_ifb_matches_lockstep(setup, rng):
    cfg, params = setup
    n = 5
    mels = rng.standard_normal(
        (n, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    gen = GenerationConfig(max_new_tokens=10)
    ref_tokens, ref_lens = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_tokens, ref_lens = np.asarray(ref_tokens), np.asarray(ref_lens)

    batcher = InflightBatcher(params, cfg, gen, num_lanes=2, segment_steps=4)
    rids = [batcher.submit(mels[i]) for i in range(n)]
    batcher.run()

    for i, rid in enumerate(rids):
        out = batcher.fetch(rid)
        assert out is not None
        expect = ref_tokens[i, : ref_lens[i]]
        np.testing.assert_array_equal(out[: len(expect)], expect)


def test_ifb_incremental_submission(setup, rng):
    """Requests submitted while others are mid-flight still come out right."""
    cfg, params = setup
    mels = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=8)
    ref_tokens, ref_lens = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_tokens, ref_lens = np.asarray(ref_tokens), np.asarray(ref_lens)

    batcher = InflightBatcher(params, cfg, gen, num_lanes=2, segment_steps=3)
    r0 = batcher.submit(mels[0])
    batcher.state = batcher._segment(batcher.params, batcher.state)  # idle ok
    batcher._retire_and_admit()
    batcher.state = batcher._segment(batcher.params, batcher.state)
    r1 = batcher.submit(mels[1])
    r2 = batcher.submit(mels[2])
    batcher.run()
    for i, rid in enumerate([r0, r1, r2]):
        out = batcher.fetch(rid)
        expect = ref_tokens[i, : ref_lens[i]]
        np.testing.assert_array_equal(out[: len(expect)], expect)


def test_ifb_server_backend(setup, rng):
    """The IFB-backed serving loop produces the same results via the
    submit/step/fetch surface."""
    from whisper_trtllm_tpu.runtime.server import IfbTranscriptionServer

    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8)
    mels = rng.standard_normal(
        (3, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref_tokens, ref_lens = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_tokens, ref_lens = np.asarray(ref_tokens), np.asarray(ref_lens)

    srv = IfbTranscriptionServer(params, cfg, gen, num_slots=2, segment_steps=4)
    rids = [srv.batcher.submit(mels[i]) for i in range(3)]  # mel directly
    got = {}
    for _ in range(50):
        for r in rids:
            if r not in got:
                out = srv.fetch(r)   # fetch pops: keep what we get
                if out is not None:
                    got[r] = out
        if len(got) == len(rids):
            break
        srv.step()
    for i, rid in enumerate(rids):
        assert rid in got
        expect = ref_tokens[i, : ref_lens[i]]
        np.testing.assert_array_equal(np.asarray(got[rid])[: len(expect)], expect)


def test_batcher_pins_weights_on_device(setup):
    """Regression for the round-4 17x serving bug: a batcher constructed
    with HOST numpy weights must hold jax.Array leaves, or every segment
    dispatch re-uploads the whole weight tree (cli/serve.py passes raw
    checkpoint numpy)."""
    import jax

    cfg, params = setup
    host_params = jax.tree_util.tree_map(np.asarray, params)  # force numpy
    b = InflightBatcher(host_params, cfg,
                        GenerationConfig(max_new_tokens=4), num_lanes=2)
    leaves = jax.tree_util.tree_leaves(b.params)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8"])
def test_ifb_quantized_kv_matches_lockstep(setup, rng, kv_dtype):
    """ADVICE r4: --kv-cache-dtype must actually reach the in-flight
    backend. Quantized lanes (int8/fp8 self + cross, auto T-minor layout)
    must reproduce the lockstep quantized decode exactly, lane stagger and
    all."""
    cfg, params = setup
    n = 4
    mels = rng.standard_normal(
        (n, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    gen = GenerationConfig(max_new_tokens=10, kv_cache_dtype=kv_dtype)
    ref_tokens, ref_lens = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_tokens, ref_lens = np.asarray(ref_tokens), np.asarray(ref_lens)

    batcher = InflightBatcher(params, cfg, gen, num_lanes=2, segment_steps=3)
    # the lanes must actually hold quantized caches (4-tuples)
    assert len(batcher.state.self_kv) == 4
    assert len(batcher.state.cross_kv) == 4
    rids = [batcher.submit(mels[i]) for i in range(n)]
    batcher.run()
    for i, rid in enumerate(rids):
        out = batcher.fetch(rid)
        assert out is not None
        expect = ref_tokens[i, : ref_lens[i]]
        np.testing.assert_array_equal(out[: len(expect)], expect)


def test_ifb_double_buffered_matches_lockstep(setup, rng, monkeypatch):
    """WHISPER_TPU_IFB_DOUBLE_BUFFER=1 keeps one segment in flight past
    the host sync; token streams must be identical, including lanes that
    retire and re-admit behind the in-flight segment (the epoch guard)."""
    monkeypatch.setenv("WHISPER_TPU_IFB_DOUBLE_BUFFER", "1")
    cfg, params = setup
    n = 7
    mels = rng.standard_normal(
        (n, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=10, kv_cache_dtype="int8")
    ref_tokens, ref_lens = transcribe_tokens(params, cfg, jnp.asarray(mels), gen)
    ref_tokens, ref_lens = np.asarray(ref_tokens), np.asarray(ref_lens)

    batcher = InflightBatcher(params, cfg, gen, num_lanes=2, segment_steps=4)
    assert batcher._double_buffer
    rids = [batcher.submit(mels[i]) for i in range(n)]
    batcher.run()
    for i, rid in enumerate(rids):
        out = batcher.fetch(rid)
        assert out is not None, f"request {i} never retired"
        expect = ref_tokens[i, : ref_lens[i]]
        np.testing.assert_array_equal(out[: len(expect)], expect)
