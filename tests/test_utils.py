"""Utils coverage: profiler, logger, config edge cases."""

import time

import pytest

from whisper_trtllm_tpu.config import GenerationConfig, MeshConfig, WhisperConfig
from whisper_trtllm_tpu.utils.profiler import Timer


def test_timer_tags_and_summary():
    t = Timer()
    with t.time("phase_a"):
        time.sleep(0.01)
    t.start("phase_b")
    time.sleep(0.005)
    elapsed = t.stop("phase_b")
    assert elapsed >= 0.004
    assert t.elapsed("phase_a") >= 0.009
    s = t.summary()
    assert "phase_a" in s and "phase_b" in s
    t.reset("phase_a")
    assert t.elapsed("phase_a") == 0.0
    t.reset()
    assert "phase_b" not in t.summary()


def test_unknown_preset_raises():
    with pytest.raises(ValueError, match="unknown Whisper preset"):
        WhisperConfig.preset("whisper-nonexistent")


def test_presets_resolve():
    for name in ("tiny.en", "base.en", "small.en", "medium.en", "large-v3"):
        cfg = WhisperConfig.preset(f"whisper-{name}")
        assert cfg.d_model > 0


def test_from_hf_merges_generation_config():
    from transformers import WhisperConfig as HFConfig

    hf = HFConfig(vocab_size=97, d_model=32, encoder_layers=1,
                  decoder_layers=1, encoder_attention_heads=4,
                  decoder_attention_heads=4, encoder_ffn_dim=64,
                  decoder_ffn_dim=64, max_source_positions=24,
                  max_target_positions=16, pad_token_id=2,
                  suppress_tokens=[], begin_suppress_tokens=[])

    class GC:
        suppress_tokens = [5]
        begin_suppress_tokens = [3]
        forced_decoder_ids = [[1, 11]]
        decoder_start_token_id = 1
        eos_token_id = 2
        pad_token_id = 2
        bos_token_id = 1
        no_timestamps_token_id = 40
        max_initial_timestamp_index = 7

    cfg = WhisperConfig.from_hf(hf, GC())
    assert cfg.suppress_tokens == (5,)
    assert cfg.forced_decoder_ids == ((1, 11),)
    assert cfg.no_timestamps_token_id == 40
    assert cfg.max_initial_timestamp_index == 7


def test_mesh_config_world_size():
    m = MeshConfig(data=2, model=4)
    assert m.world_size == 8 and m.axis_names() == ("data", "model")
    assert MeshConfig.from_json(m.to_json()) == m


def test_generation_config_roundtrip():
    g = GenerationConfig(max_new_tokens=7, num_beams=3, kv_cache_dtype="int8")
    assert GenerationConfig.from_json(g.to_json()) == g


def test_memory_monitor_runs():
    """MemoryMonitor degrades gracefully when the backend keeps no stats
    (reference: benchmarks/mem_monitor.py — pynvml polling loop)."""
    import time as _time

    from whisper_trtllm_tpu.benchmarks.mem_monitor import (
        MemoryMonitor,
        get_memory_info,
    )

    total, used, peak = get_memory_info()
    assert (total == -1.0) or (total >= 0 and used >= 0)
    mon = MemoryMonitor(interval=0.01).start()
    _time.sleep(0.05)
    p = mon.stop()
    assert p == -1.0 or p >= 0.0
    # stop twice is safe
    assert mon.stop() == p


class TestRouge:
    """Self-contained ROUGE (utils/metrics.py::rouge_scores — the
    reference's summarize.py metric without the evaluate/rouge_score
    dependency)."""

    def test_identical_is_one(self):
        from whisper_trtllm_tpu.utils.metrics import rouge_scores

        s = rouge_scores(["the cat sat on the mat"],
                         ["the cat sat on the mat"])
        assert s["rouge1"] == s["rouge2"] == s["rougeL"] == 1.0

    def test_disjoint_is_zero(self):
        from whisper_trtllm_tpu.utils.metrics import rouge_scores

        s = rouge_scores(["alpha beta"], ["gamma delta"])
        assert s["rouge1"] == s["rouge2"] == s["rougeL"] == 0.0

    def test_hand_computed(self):
        from whisper_trtllm_tpu.utils.metrics import rouge_scores

        # hyp: "the cat sat", ref: "the cat lay down"
        # rouge1: match {the, cat}=2, p=2/3, r=2/4 -> f1=4/7
        # rouge2: match {the cat}=1, p=1/2, r=1/3 -> f1=2/5
        # rougeL: lcs "the cat"=2 -> same as rouge1 f1
        s = rouge_scores(["the cat sat"], ["the cat lay down"])
        assert abs(s["rouge1"] - 4 / 7) < 1e-9
        assert abs(s["rouge2"] - 2 / 5) < 1e-9
        assert abs(s["rougeL"] - 4 / 7) < 1e-9

    def test_corpus_mean_and_case(self):
        from whisper_trtllm_tpu.utils.metrics import rouge_scores

        s = rouge_scores(["The CAT sat", "x"], ["the cat sat", "y"])
        assert abs(s["rouge1"] - 0.5) < 1e-9
