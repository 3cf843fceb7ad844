"""Sharding tests on the virtual 8-device CPU mesh — cluster-free
distributed testing the reference lacks (SURVEY.md §4: multi-GPU only via
mpirun examples, not CI-tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_trtllm_tpu.config import GenerationConfig, MeshConfig, WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.parallel import make_mesh, param_partition_specs, shard_params
from whisper_trtllm_tpu.runtime.generation import transcribe_tokens


@pytest.fixture(scope="module")
def cfg():
    return WhisperConfig.testing(
        d_model=64,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        vocab_size=128,
        forced_decoder_ids=((1, 11),),
    )


def test_mesh_and_param_shardings(cfg):
    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = shard_params(init_params(cfg, seed=0), mesh)
    # column-parallel q kernel sharded on output dim over 'model'
    qk = params["decoder"]["layers"]["self_attn"]["q"]["kernel"]
    assert qk.sharding.spec == P(None, None, "model")
    # row-parallel out kernel sharded on input dim
    ok = params["decoder"]["layers"]["self_attn"]["out"]["kernel"]
    assert ok.sharding.spec == P(None, "model", None)
    # replicated embed table
    assert params["decoder"]["embed_tokens"].sharding.spec == P()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4)])
def test_sharded_inference_matches_single_device(cfg, rng, mesh_shape):
    """TP+DP execution must be numerically identical to single-device — the
    analog of the reference running TP plumbing with world_size=1
    (reference: tests/model/test_gpt.py:60-61), but with real 8-way sharding."""
    gen = GenerationConfig(max_new_tokens=8)
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (8, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    ref_tokens, ref_lens = jax.jit(
        lambda p, m: transcribe_tokens(p, cfg, m, gen)
    )(params, mel)

    mesh = make_mesh(MeshConfig(*mesh_shape))
    sharded = shard_params(params, mesh)
    mel_sharded = jax.device_put(mel, NamedSharding(mesh, P("data")))
    with mesh:
        tokens, lens = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))(
            sharded, mel_sharded
        )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


def test_train_step_sharded_matches_unsharded(cfg, rng):
    import optax

    from whisper_trtllm_tpu.training import make_train_step

    params = init_params(cfg, seed=0)
    batch = 4
    mel = rng.standard_normal(
        (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (batch, 8)).astype(np.int32)
    mask = np.ones((batch, 7), np.float32)

    opt = optax.sgd(1e-2)
    init_opt, step = make_train_step(cfg, opt)
    _, _, loss_ref = step(params, init_opt(params), mel, tokens, mask)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    sp = shard_params(init_params(cfg, seed=0), mesh)
    ds = NamedSharding(mesh, P("data"))
    init_opt2, step2 = make_train_step(cfg, opt, mesh=mesh)
    with mesh:
        p2, _, loss_sharded = step2(
            sp, init_opt2(sp),
            jax.device_put(mel, ds), jax.device_put(tokens, ds),
            jax.device_put(mask, ds),
        )
    np.testing.assert_allclose(float(loss_ref), float(loss_sharded), rtol=1e-5)


def test_check_devices():
    from whisper_trtllm_tpu.parallel.mesh import check_devices, make_mesh
    from whisper_trtllm_tpu.config import MeshConfig

    report = check_devices(make_mesh(MeshConfig(data=8, model=1)))
    assert report == {"devices": 8, "ok": True}


def test_scaling_harness_measure():
    from whisper_trtllm_tpu.benchmarks.scaling import measure

    row = measure("tiny_en", n_devices=2, per_device_batch=1,
                  model_parallel=1, gen_tokens=2, iters=1)
    assert row["devices"] == 2 and row["batch"] == 2
    assert row["audio_s_per_s"] > 0


def test_fused_qkv_sharded_inference(cfg, rng):
    from whisper_trtllm_tpu.models.whisper.model import fuse_qkv_params

    gen = GenerationConfig(max_new_tokens=6)
    params = init_params(cfg, seed=0)
    fused = fuse_qkv_params(params)
    ref, _ = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))(
        params,
        mel := rng.standard_normal(
            (4, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32),
    )
    mesh = make_mesh(MeshConfig(data=2, model=4))
    sharded = shard_params(fused, mesh)
    assert sharded["decoder"]["layers"]["self_attn"]["qkv"]["kernel"].sharding.spec == P(None, None, "model")
    with mesh:
        out, _ = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))(
            sharded, jax.device_put(mel, NamedSharding(mesh, P("data")))
        )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sharded_quantized_session(cfg, rng):
    """TP + int8 weights must load and run (specs adapt to kernel_q/scale)."""
    from whisper_trtllm_tpu.config import GenerationConfig, RuntimeConfig
    from whisper_trtllm_tpu.runtime import WhisperSession

    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = init_params(cfg, seed=0)
    sess = WhisperSession(
        params, cfg, GenerationConfig(max_new_tokens=4),
        RuntimeConfig(weight_dtype="int8"), mesh=mesh,
    )
    qk = sess.params["decoder"]["layers"]["fc1"]["kernel_q"]
    assert qk.sharding.spec == P(None, None, "model")
    sc = sess.params["decoder"]["layers"]["fc1"]["scale"]
    assert sc.sharding.spec == P(None, "model")
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens, _ = sess.transcribe_features(mel)
    assert tokens.shape[0] == 2


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_uneven_heads_tp_matches_single_device(rng, mesh_shape):
    """heads % tp != 0 (SURVEY §7 hard part f — medium.en has 16 heads but
    6-head tiny-like configs don't divide 4- or 8-way): GSPMD pads the
    sharded hidden dim; results must stay bit-identical to single device."""
    cfg6 = WhisperConfig.testing(
        d_model=96,
        encoder_attention_heads=6,
        decoder_attention_heads=6,
        encoder_ffn_dim=192,
        decoder_ffn_dim=192,
        vocab_size=128,
        forced_decoder_ids=((1, 11),),
    )
    gen = GenerationConfig(max_new_tokens=6)
    params = init_params(cfg6, seed=0)
    mel = rng.standard_normal(
        (8, 2 * cfg6.max_source_positions, cfg6.num_mel_bins)
    ).astype(np.float32)
    ref_tokens, ref_lens = jax.jit(
        lambda p, m: transcribe_tokens(p, cfg6, m, gen)
    )(params, mel)

    mesh = make_mesh(MeshConfig(*mesh_shape))
    sharded = shard_params(params, mesh)
    mel_sharded = jax.device_put(mel, NamedSharding(mesh, P("data")))
    with mesh:
        tokens, lens = jax.jit(lambda p, m: transcribe_tokens(p, cfg6, m, gen))(
            sharded, mel_sharded
        )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


def test_sharded_int8_vocab_inference(cfg, rng):
    """int8-quantized vocab table (dict leaf at decoder.embed_tokens) must
    shard (replicated) and run under DP x TP."""
    from whisper_trtllm_tpu.quantization import quantize_vocab_embedding

    gen = GenerationConfig(max_new_tokens=6)
    params = quantize_vocab_embedding(init_params(cfg, seed=0))
    mel = rng.standard_normal(
        (8, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    ref_tokens, _ = jax.jit(
        lambda p, m: transcribe_tokens(p, cfg, m, gen)
    )(params, mel)

    mesh = make_mesh(MeshConfig(2, 4))
    sharded = shard_params(params, mesh)
    assert sharded["decoder"]["embed_tokens"]["table_q"].dtype == jnp.int8
    mel_sharded = jax.device_put(mel, NamedSharding(mesh, P("data")))
    with mesh:
        tokens, _ = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))(
            sharded, mel_sharded
        )
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


def test_beam_search_sharded_matches_single_device(cfg, rng):
    """Beam search under a TP mesh: the beam-parent cache reorder
    (take_along_axis over sharded KV, replacing the reference's
    cache_indirection ping-pong, reference:
    tensorrt_llm/runtime/generation.py:823-915) must stay on device and be
    bit-exact vs the unsharded run — SURVEY §7 hard part (e)."""
    from whisper_trtllm_tpu.models.whisper import encode
    from whisper_trtllm_tpu.runtime.beam import beam_decode

    gen = GenerationConfig(max_new_tokens=6, num_beams=3)
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (4, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)

    enc = jax.jit(lambda p, m: encode(p, cfg, m))(params, mel)
    ref_tokens, ref_scores, ref_lens = beam_decode(params, cfg, enc, gen)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    sharded = shard_params(params, mesh)
    mel_sharded = jax.device_put(mel, NamedSharding(mesh, P("data")))
    with mesh:
        enc_s = jax.jit(lambda p, m: encode(p, cfg, m))(sharded, mel_sharded)
        tokens, scores, lens = beam_decode(sharded, cfg, enc_s, gen)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_zoo_gpt_tp_matches_single_device(rng, mesh_shape):
    """TP for the zoo, not just Whisper: GPT generation under a sharded
    tree must equal single-device exactly (the reference applies
    ColumnLinear/RowLinear TP to every family; per-rank engines,
    examples/gpt/build.py:24-25)."""
    from whisper_trtllm_tpu.models import gpt
    from whisper_trtllm_tpu.parallel import shard_zoo_params

    cfg = gpt.GPTConfig.testing(d_model=64, n_head=4, ffn_dim=128)
    params = gpt.init_params(cfg, seed=0)
    prompt = rng.integers(3, cfg.vocab_size, (8, 4)).astype(np.int32)

    ref = np.asarray(gpt.generate(params, cfg, jnp.asarray(prompt),
                                  max_new_tokens=6))

    mesh = make_mesh(MeshConfig(*mesh_shape))
    sharded = shard_zoo_params(params, mesh, "gpt")
    qk = sharded["layers"]["attn_qkv"]["kernel"]
    assert qk.sharding.spec == P(None, None, "model")
    prompt_sharded = jax.device_put(
        jnp.asarray(prompt), NamedSharding(mesh, P("data")))
    with mesh:
        out = np.asarray(gpt.generate(sharded, cfg, prompt_sharded,
                                      max_new_tokens=6))
    np.testing.assert_array_equal(out, ref)


def test_zoo_llama_tp_matches_single_device(rng):
    """LLaMA (GQA + gated MLP + untied head) under 4-way TP."""
    from whisper_trtllm_tpu.models import llama
    from whisper_trtllm_tpu.parallel import shard_zoo_params

    cfg = llama.LlamaConfig.testing()
    params = llama.init_params(cfg, seed=0)
    prompt = rng.integers(3, cfg.vocab_size, (4, 5)).astype(np.int32)

    ref = np.asarray(llama.generate(params, cfg, jnp.asarray(prompt),
                                    max_new_tokens=6))
    mesh = make_mesh(MeshConfig(2, 4))
    sharded = shard_zoo_params(params, mesh, "llama")
    with mesh:
        out = np.asarray(llama.generate(sharded, cfg, jnp.asarray(prompt),
                                        max_new_tokens=6))
    np.testing.assert_array_equal(out, ref)
