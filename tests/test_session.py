"""Session-level API tests (analog of reference: tests/test_session.py:19-57)."""

import numpy as np
import pytest

from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.runtime import WhisperSession


@pytest.fixture(scope="module")
def cfg():
    return WhisperConfig.testing()


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, seed=0)


def test_transcribe_features(cfg, params, rng):
    sess = WhisperSession(params, cfg, GenerationConfig(max_new_tokens=8))
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = sess.transcribe_features(mel)
    assert tokens.shape[0] == 2 and lengths.shape == (2,)
    assert (tokens[:, 0] == cfg.decoder_start_token_id).all()


def test_beam_session(cfg, params, rng):
    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=8, num_beams=3)
    )
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = sess.transcribe_features(mel)
    assert tokens.shape[0] == 2
    assert (tokens[:, 0] == cfg.decoder_start_token_id).all()


def test_checkpoint_roundtrip(tmp_path, cfg, params):
    import jax

    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path / "ckpt"), params, cfg)
    params2, cfg2 = load_checkpoint(str(tmp_path / "ckpt"))
    assert cfg2 == cfg
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_session_runs(cfg, params, rng):
    from whisper_trtllm_tpu.config import RuntimeConfig

    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=4),
        RuntimeConfig(compute_dtype="bfloat16"),
    )
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = sess.transcribe_features(mel)
    assert np.isfinite(lengths).all()


def test_orbax_sharded_roundtrip(tmp_path, cfg, params):
    import jax

    from whisper_trtllm_tpu.config import MeshConfig
    from whisper_trtllm_tpu.parallel import make_mesh, shard_params
    from whisper_trtllm_tpu.utils.checkpoint import load_sharded, save_sharded

    mesh = make_mesh(MeshConfig(data=2, model=4))
    sharded = shard_params(params, mesh)
    save_sharded(str(tmp_path / "orbax_ckpt"), sharded)
    restored = load_sharded(str(tmp_path / "orbax_ckpt"))
    for a, b in zip(jax.tree_util.tree_leaves(sharded),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_weight_session(cfg, params, rng):
    from whisper_trtllm_tpu.config import RuntimeConfig

    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=6),
        RuntimeConfig(compute_dtype="bfloat16", weight_dtype="int8"),
    )
    assert sess.params["decoder"]["layers"]["fc1"]["kernel_q"].dtype == "int8"
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, lengths = sess.transcribe_features(mel)
    assert (tokens[:, 0] == cfg.decoder_start_token_id).all()


def test_warmup_compiles(cfg, params):
    sess = WhisperSession(params, cfg, GenerationConfig(max_new_tokens=4))
    sess.warmup(batch=2)  # must not raise; compiles the (2, T, M) pipeline
    stats = sess.memory_stats()
    assert set(stats) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}


def test_fused_session_matches_default(cfg, params, rng):
    from whisper_trtllm_tpu.config import RuntimeConfig

    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref, _ = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=6)
    ).transcribe_features(mel)
    out, _ = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=6),
        RuntimeConfig(fuse_qkv=True),
    ).transcribe_features(mel)
    np.testing.assert_array_equal(out, ref)


def test_refit_with_transforms(cfg, params, rng):
    """refit must route new weights through the same load-time transforms
    (fusion + quantization) as __init__."""
    from whisper_trtllm_tpu.config import RuntimeConfig

    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=4),
        RuntimeConfig(fuse_qkv=True, weight_dtype="int8"),
    )
    t1, _ = sess.transcribe_features(mel)
    sess.refit(init_params(cfg, seed=1))
    assert "qkv" in sess.params["decoder"]["layers"]["self_attn"]
    assert sess.params["decoder"]["layers"]["fc1"]["kernel_q"].dtype == "int8"
    t2, _ = sess.transcribe_features(mel)
    assert not np.array_equal(t1, t2)


def test_int4_weight_session(cfg, params, rng):
    from whisper_trtllm_tpu.config import RuntimeConfig

    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=4),
        RuntimeConfig(weight_dtype="int4"),
    )
    assert "kernel_q4" in sess.params["decoder"]["layers"]["fc1"]
    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, _ = sess.transcribe_features(mel)
    assert (tokens[:, 0] == cfg.decoder_start_token_id).all()


def test_unknown_weight_dtype_raises(cfg, params):
    from whisper_trtllm_tpu.config import RuntimeConfig

    with pytest.raises(ValueError, match="unknown weight_dtype"):
        WhisperSession(params, cfg, GenerationConfig(max_new_tokens=4),
                       RuntimeConfig(weight_dtype="int-8"))


def test_engine_export_roundtrip(tmp_path, rng):
    """Serialized engine artifact (utils/engine.py): export the jitted
    pipeline, reload it, and get identical transcriptions — the analog of
    the reference's serialize_engine -> deserialize flow
    (reference: examples/whisper/build_encoder.py:14-21 + run.py:61-63),
    including weight refit (the engine takes params as an argument)."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.engine import load_engine

    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    sess = WhisperSession(params, cfg, GenerationConfig(max_new_tokens=6))
    path = str(tmp_path / "whisper.engine")
    nbytes = sess.export_engine(path, batch=2)
    assert nbytes > 0

    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref_tokens, ref_lens = sess.transcribe_features(mel)

    eng = load_engine(path)
    tokens, lens = eng(sess.params, jnp.asarray(mel))
    np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)
    np.testing.assert_array_equal(np.asarray(lens), ref_lens)

    # refit: different weights through the SAME engine
    params2 = init_params(cfg, seed=1)
    sess2 = WhisperSession(params2, cfg, GenerationConfig(max_new_tokens=6))
    ref2, _ = sess2.transcribe_features(mel)
    out2, _ = eng(sess2.params, jnp.asarray(mel))
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_engine_export_bf16_quantized(tmp_path, rng):
    """Engines serialize transformed trees too: bf16 compute + int8
    weight-only quantized params round-trip through jax.export."""
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import (
        GenerationConfig, RuntimeConfig, WhisperConfig)
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime import WhisperSession
    from whisper_trtllm_tpu.utils.engine import load_engine

    cfg = WhisperConfig.testing()
    sess = WhisperSession(
        init_params(cfg, seed=0), cfg, GenerationConfig(max_new_tokens=5),
        RuntimeConfig(compute_dtype="bfloat16", weight_dtype="int8"),
    )
    path = str(tmp_path / "w.engine")
    assert sess.export_engine(path, batch=1) > 0

    mel = rng.standard_normal(
        (1, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref_tokens, _ = sess.transcribe_features(mel)
    eng = load_engine(path)
    tokens, _ = eng(sess.params, jnp.asarray(mel, jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(tokens), ref_tokens)
