"""Quantization mode flags (analog of reference:
tensorrt_llm/quantization/mode.py:4-137 — the same IntFlag algebra)."""

from __future__ import annotations

import enum


class QuantMode(enum.IntFlag):
    NONE = 0
    INT8_WEIGHTS = enum.auto()      # weight-only int8 (per-channel scales)
    INT4_WEIGHTS = enum.auto()      # weight-only int4 (packed nibbles)
    INT8_KV_CACHE = enum.auto()     # int8 KV cache (per-token scales)
    FP8_QDQ = enum.auto()           # fp8 quant/dequant          [reserved]

    def has_int8_weights(self) -> bool:
        return bool(self & QuantMode.INT8_WEIGHTS)

    def has_int8_kv_cache(self) -> bool:
        return bool(self & QuantMode.INT8_KV_CACHE)

    @classmethod
    def use_weight_only(cls, use_int4: bool = False) -> "QuantMode":
        return cls.INT4_WEIGHTS if use_int4 else cls.INT8_WEIGHTS
