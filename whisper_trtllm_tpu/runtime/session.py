"""Serving session: device-resident weights + AOT-compiled pipeline.

Analog of the reference's Session/GenerationSession pair
(reference: tensorrt_llm/runtime/session.py:27-207,
tensorrt_llm/runtime/generation.py:104-1000 and the engine wrappers in
examples/whisper/run.py:57-148). Differences by design:

- "engine load" = device_put of the weight tree (+ optional sharding);
- "engine execution contract" = jitted function signatures, no name-string
  I/O binding;
- per-batch-shape executables are cached (the analog of TRT optimization
  profiles, reference: tensorrt_llm/builder.py:144-160).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisper_trtllm_tpu.config import (
    GenerationConfig,
    MeshConfig,
    RuntimeConfig,
    WhisperConfig,
)
from whisper_trtllm_tpu.audio.features import LogMelSpectrogram, pad_or_trim
from whisper_trtllm_tpu.models.whisper import model as wmodel
from whisper_trtllm_tpu.runtime import generation as gen_rt


class WhisperSession:
    """End-to-end ASR serving: audio/mel in, token ids (+lengths) out."""

    def __init__(
        self,
        params: dict,
        cfg: WhisperConfig,
        generation: Optional[GenerationConfig] = None,
        runtime: Optional[RuntimeConfig] = None,
        mesh: Optional["jax.sharding.Mesh"] = None,
    ):
        self.cfg = cfg
        self.generation = generation or GenerationConfig()
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh

        if self.runtime.persistent_cache_dir:
            from whisper_trtllm_tpu.utils.checkpoint import init_compilation_cache

            init_compilation_cache(self.runtime.persistent_cache_dir)

        self._dtype = jnp.dtype(self.runtime.compute_dtype)
        self.params = self._prepare_params(params)
        self.frontend = LogMelSpectrogram(cfg.num_mel_bins, dtype=self._dtype)

    def _prepare_params(self, params: dict) -> dict:
        """The load-time transform chain — fusion → quantization → cast →
        placement — shared by __init__ and refit so hot-swapped trees always
        match the compiled executables' structure."""
        if self.runtime.fuse_qkv:
            from whisper_trtllm_tpu.models.whisper.model import fuse_qkv_params

            params = fuse_qkv_params(params)
        wd = self.runtime.weight_dtype
        if wd == "int8":
            from whisper_trtllm_tpu.quantization import weight_only_quantize

            params = weight_only_quantize(params)
        elif wd == "int4":
            from whisper_trtllm_tpu.quantization import weight_only_quantize_int4

            params = weight_only_quantize_int4(params)
        elif wd == "fp8":
            from whisper_trtllm_tpu.quantization import fp8_quantize

            params = fp8_quantize(params)
        elif wd != "native":
            raise ValueError(
                f"unknown weight_dtype {wd!r}; expected native/int8/int4/fp8"
            )
        if self.runtime.quantize_vocab:
            from whisper_trtllm_tpu.quantization import quantize_vocab_embedding

            params = quantize_vocab_embedding(params)
        params = wmodel.cast_params(params, self._dtype)
        if self.mesh is not None:
            from whisper_trtllm_tpu.parallel.partition import shard_params

            return shard_params(params, self.mesh)
        return jax.device_put(params)

    # -- compiled pipelines (cached per call signature) ----------------------
    @functools.cached_property
    def _pipeline(self):
        cfg, gen = self.cfg, self.generation

        if gen.num_beams > 1:
            from whisper_trtllm_tpu.runtime.beam import beam_decode

            def fn(params, mel):
                enc = wmodel.encode(params, cfg, mel)
                tokens, scores, lengths = beam_decode(params, cfg, enc, gen)
                # best hypothesis per utterance, greedy-compatible signature
                return tokens[:, 0], lengths[:, 0]
        else:
            def fn(params, mel):
                return gen_rt.transcribe_tokens(params, cfg, mel, gen)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(self.mesh, P("data"))
            return jax.jit(fn, in_shardings=(None, data))
        return jax.jit(fn)

    @functools.cached_property
    def _encode(self):
        cfg = self.cfg
        return jax.jit(lambda params, mel: wmodel.encode(params, cfg, mel))

    # -- public API -----------------------------------------------------------
    def transcribe_features(self, mel) -> Tuple[np.ndarray, np.ndarray]:
        """mel (B, 3000, n_mels) → (tokens (B, max_len), lengths (B,))."""
        mel = jnp.asarray(mel, self._dtype)
        tokens, lengths = self._pipeline(self.params, mel)
        # one packed D2H window (sequential np.asarray pays a full
        # round-trip per array on high-latency transports)
        return jax.device_get((tokens, lengths))

    def transcribe(self, audio) -> Tuple[np.ndarray, np.ndarray]:
        """Raw audio (B, n_samples) 16 kHz → (tokens, lengths); pads/trims to
        30 s and runs the on-device frontend."""
        audio = np.atleast_2d(np.asarray(audio))
        mel = self.frontend.jit()(jnp.asarray(pad_or_trim(audio)))
        tokens, lengths = self._pipeline(self.params, mel.astype(self._dtype))
        return jax.device_get((tokens, lengths))

    def encode(self, mel) -> jnp.ndarray:
        return self._encode(self.params, jnp.asarray(mel, self._dtype))

    def refit(self, params: dict) -> None:
        """Hot-swap weights without recompiling (analog of TRT engine refit,
        reference: tensorrt_llm/builder.py:162-201): the new tree goes through
        the same load-time transform chain (_prepare_params) so its structure
        matches the compiled executables, then replaces the old weights."""
        self.params = self._prepare_params(params)

    def memory_stats(self) -> dict:
        """Device memory usage (analog of benchmarks/mem_monitor.py)."""
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }

    def warmup(self, batch: int = 1) -> None:
        """Pre-compile for a batch size (the analog of engine build; with a
        persistent cache dir this is one-time per topology)."""
        mel = jnp.zeros((batch, 2 * self.cfg.max_source_positions,
                         self.cfg.num_mel_bins), self._dtype)
        tokens, _ = self._pipeline(self.params, mel)
        tokens.block_until_ready()

    def export_engine(self, path: str, batch: int = 1) -> int:
        """Serialize the full transcribe pipeline at this batch size to a
        self-contained engine file — the analog of the reference's
        serialized ``.engine`` artifact (reference:
        examples/whisper/build_encoder.py:14-21,109; deserialized by
        examples/whisper/run.py:61-63). The engine takes (params, mel), so
        it stays weight-refittable like a TRT refit engine. Load with
        utils.engine.load_engine — no model code needed at serving time."""
        from whisper_trtllm_tpu.utils.engine import save_engine

        mel = jax.ShapeDtypeStruct(
            (batch, 2 * self.cfg.max_source_positions,
             self.cfg.num_mel_bins), self._dtype)
        params_avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            self.params)
        return save_engine(path, self._pipeline, params_avals, mel)
