"""Training-step sanity: loss is finite and decreases on a fixed batch."""

import numpy as np
import optax

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.training import cross_entropy_loss, make_train_step


def test_loss_decreases(rng):
    cfg = WhisperConfig.testing()
    params = init_params(cfg, seed=0)
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    mask = np.ones((2, 7), np.float32)

    init_opt, step = make_train_step(cfg, optax.adam(1e-3))
    opt_state = init_opt(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, mel, tokens, mask)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_pallas_disabled_context():
    """The training path must trace the jnp formulations (Pallas kernels
    have no VJP); the context must nest and restore."""
    from whisper_trtllm_tpu.ops.pallas import pallas_disabled, _disabled_depth  # noqa
    import whisper_trtllm_tpu.ops.pallas as pk

    assert pk._disabled_depth == 0
    with pallas_disabled():
        assert pk.pallas_enabled() is False
        with pallas_disabled():
            assert pk._disabled_depth == 2
    assert pk._disabled_depth == 0


def test_remat_step_matches_plain(rng):
    """--remat (per-layer encoder rematerialization, the medium-fit lever)
    must be a pure memory/FLOPs trade: same losses, step for step."""
    cfg = WhisperConfig.testing()
    mel = rng.standard_normal(
        (2, 2 * cfg.max_source_positions, cfg.num_mel_bins)
    ).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    mask = np.ones((2, 7), np.float32)

    losses = {}
    for remat in (False, True):
        params = init_params(cfg, seed=0)
        init_opt, step = make_train_step(cfg, optax.adam(1e-3), remat=remat)
        opt_state = init_opt(params)
        ls = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, mel, tokens,
                                           mask)
            ls.append(float(loss))
        losses[remat] = ls
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)
