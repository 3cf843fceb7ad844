"""Sanity checks on the analytic FLOP/byte model behind bench.py's MFU and
roofline fields."""

import numpy as np

from whisper_trtllm_tpu.benchmarks import roofline
from whisper_trtllm_tpu.config import WhisperConfig


def test_chip_peaks_known_and_unknown():
    tf, bw = roofline.chip_peaks("TPU v5 lite")
    assert tf == 197.0 and bw == 819.0
    assert roofline.chip_peaks("Mystery Chip") == (None, None)


def test_flops_scale_with_architecture():
    tiny = WhisperConfig.tiny_en()
    medium = WhisperConfig.medium_en()
    # medium has 6x layers and ~2.7x width — well over 10x the FLOPs
    assert roofline.encoder_flops(medium) > 10 * roofline.encoder_flops(tiny)
    assert roofline.decode_flops(medium, 48) > 10 * roofline.decode_flops(tiny, 48)
    # decode flops grow with generated length (self-attention window)
    assert roofline.decode_flops(tiny, 96) > 2 * roofline.decode_flops(tiny, 48) * 0.99


def test_tiny_en_magnitudes():
    """Anchor the absolute scale: tiny.en encoder ≈ 2 × 8M encoder params ×
    1500 positions ≈ 25 GFLOP plus ~14 GFLOP of S² attention — mid-tens of
    GFLOPs per 30 s utterance; a decode step is ~40-80 MFLOP (weights read
    once: L(6d² + 2·d·ffn)·2 + 2dV ≈ 37M, plus ~18M of cross-attention)."""
    cfg = WhisperConfig.tiny_en()
    enc = roofline.encoder_flops(cfg)
    assert 2e10 < enc < 8e10
    step0 = roofline.decode_step_flops(cfg, 0)
    # weights part: L*(6 d^2 + 2 d ffn)*2 + 2 d V ≈ 37 MFLOP
    assert 2e7 < step0 < 1e8
    # bytes/step at batch 16 mid-decode: weights ~18.7 MB + KV reads
    b = roofline.decode_bytes_per_step(cfg, 16, 24)
    weights = roofline.decoder_weight_bytes(cfg)
    assert weights < b < weights + 16 * 4 * 2 * (24 + 1500) * 384 * 2 * 1.01
    assert 1.5e7 < weights < 6e7


def test_pipeline_flops_compose():
    cfg = WhisperConfig.tiny_en()
    total = roofline.pipeline_flops_per_utt(cfg, 48)
    parts = (roofline.encoder_flops(cfg) + roofline.cross_kv_flops(cfg)
             + roofline.decode_flops(cfg, 48))
    np.testing.assert_allclose(total, parts)


def test_quantized_kv_scale_bytes():
    """The quantized-KV 4-tuple carries fp32 per-(token, head) scales
    ((B, H, T, 1) — ops/attention.py::quantize_kv); the decode floor must
    count them (ADVICE r4). At dh=64 int8 the correction to the KV term is
    exactly 4/64."""
    cfg = WhisperConfig.tiny_en()
    base = roofline.decode_bytes_per_step(cfg, 16, 24, kv_bytes=1.0)
    with_scales = roofline.decode_bytes_per_step(cfg, 16, 24, kv_bytes=1.0,
                                                 kv_scale_bytes=4.0)
    kv_only = base - roofline.decoder_weight_bytes(cfg)
    np.testing.assert_allclose(with_scales - base, kv_only * 4.0 / 64.0)
    # default is the float-cache convention: no scales
    np.testing.assert_allclose(
        base, roofline.decode_bytes_per_step(cfg, 16, 24, kv_bytes=1.0,
                                             kv_scale_bytes=0.0))
