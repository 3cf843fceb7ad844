"""Benchmark: end-to-end ASR throughput (audio-seconds per second per chip).

Protocol mirrors the reference's speed measurement (two passes over the
dataset, first discarded as warmup, second timed — reference:
examples/whisper/run.py:259-291), on synthetic 30 s utterances with
tiny.en-dimension weights (real checkpoints are unavailable offline; decode
cost is weight-value-independent: EOS early-exit is disabled so every
utterance decodes exactly GEN_TOKENS tokens, a realistic LibriSpeech
transcript length).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N, ...}

vs_baseline: the reference reports only *relative* speedup vs HF-GPU (1.6x
for tiny.en, reference README.md:95) and the repo target is >=1.5x HF-GPU
audio-s/s per chip (BASELINE.md). HF_GPU_AUDIO_S_PER_S below is a documented
estimate of the HF torch fp32 tiny.en e2e throughput on the contest GPU
(73 utts x 30 s in roughly 70-75 s); vs_baseline = value / (1.5 * that), i.e.
vs_baseline >= 1.0 means the north-star target is met.

The line also carries nested "medium" and "large" objects (medium.en /
large-v3 int8W+int8KV bf16 b16 throughput, MFU, decode roofline fraction —
the per-size speed table the reference reports; reference README.md:93-98;
large is memory-fit-guarded) and a "tpu_check" gate
summary (the last full cli/tpu_check.py hardware run; a missing or failing
record makes bench exit nonzero so a kernel regression cannot ride into a
BENCH number unnoticed).
"""

import dataclasses
import json
import os
import time

import numpy as np

HF_GPU_AUDIO_S_PER_S = 30.0
TARGET_MULTIPLIER = 1.5

# kernel-regression gate (VERDICT r2 order 6): the BENCH number must not
# ride over a failed or never-run on-chip check. cli/tpu_check.py writes a
# state file after every FULL hardware run; when the record is missing or
# failing, bench re-runs the suite in a subprocess (warm persistent cache
# makes this minutes at worst, seconds typically) and fails loudly
# (nonzero exit, gate details still in the JSON line) if it still fails.
# WHISPER_TPU_BENCH_SKIP_CHECK=1 bypasses (debug only).


def _read_tpu_check_state(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _tpu_check_gate():
    if os.environ.get("WHISPER_TPU_BENCH_SKIP_CHECK") == "1":
        return {"status": "skipped (env)"}
    import subprocess
    import sys

    from cli.tpu_check import (DEFAULT_STATE_PATH, STATE_PATH_ENV,
                               kernel_tree_digest)

    path = os.environ.get(STATE_PATH_ENV, DEFAULT_STATE_PATH)
    digest = kernel_tree_digest()
    state = _read_tpu_check_state(path)
    # stale = the record does not vouch for the compute-path source that is
    # about to be benchmarked (missing, failed, or recorded over different
    # ops/models/quantization content — VERDICT r3 weak 3: a passing record
    # from before a kernel change must NOT ride into a BENCH number)
    stale = (state is None or not state.get("pass")
             or state.get("kernel_digest") != digest)
    rerun_error = None
    if stale:
        try:  # subprocess: its jit/backend state must not pollute bench
            proc = subprocess.run(
                [sys.executable, "-m", "cli.tpu_check"],
                capture_output=True, text=True, timeout=3600,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if proc.returncode != 0:
                rerun_error = (f"tpu_check exit {proc.returncode}: "
                               f"{proc.stderr.strip()[-300:]}")
        except Exception as e:
            rerun_error = f"{type(e).__name__}: {e}"
        state = _read_tpu_check_state(path)
    if state is None:
        return {"status": "missing",
                "error": f"no tpu_check record at {path} and a fresh run "
                         "produced none",
                "rerun_error": rerun_error}
    gate = {
        "status": "pass" if (state.get("pass")
                             and state.get("kernel_digest") == digest)
        else "fail",
        "git_head": state.get("git_head"),
        "age_h": round((time.time() - float(state.get("ts", 0))) / 3600.0, 1),
    }
    if state.get("kernel_digest") != digest:
        gate["stale_digest"] = {"record": state.get("kernel_digest"),
                                "tree": digest}
    if rerun_error:
        gate["rerun_error"] = rerun_error
    return gate

BATCH = 32             # round-4 sweep (scripts/tiny_batch_sweep.py): bf16-KV
                       # is batch-saturated (10.7/10.8/11.0k at b16/32/64) but
                       # int8-KV keeps scaling to b32 (17.2k, = b64), where
                       # the halved KV read traffic is the win
N_BATCHES = 3          # 96 utterances, ~ the reference's 73-utt dummy set
GEN_TOKENS = 48        # tokens decoded per utterance (no EOS early exit)
AUDIO_SECONDS_PER_UTT = 30.0


def main():
    import jax

    # persistent compilation cache: first run per machine pays the compile,
    # later runs start in seconds (the reference's timing-cache analog,
    # reference: tensorrt_llm/builder.py:118-136)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from whisper_trtllm_tpu.config import GenerationConfig, WhisperConfig
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens
    from whisper_trtllm_tpu.audio.features import LogMelSpectrogram, N_SAMPLES

    from whisper_trtllm_tpu.models.whisper import cast_params

    cfg = WhisperConfig.tiny_en()
    # disable EOS early-exit so every utterance decodes exactly GEN_TOKENS
    cfg = dataclasses.replace(cfg, eos_token_id=-1)
    # headline serving precision: bf16 weights + int8 KV (T-minor cross
    # layout auto-applies). int8 KV is transcript-exact vs fp32 on trained
    # weights (ACCEPT_r4 drift study, 3 seeds, docs/PERFORMANCE.md) and
    # lifts tiny.en ~60% over bf16 KV, whose KV reads bound the step.
    # r1-r3 headlines were bf16-KV b16 — the compat field below keeps that
    # series comparable.
    gen = GenerationConfig(max_new_tokens=GEN_TOKENS, kv_cache_dtype="int8")

    params16 = jax.device_put(cast_params(init_params(cfg, seed=0), jnp.bfloat16))
    frontend = LogMelSpectrogram(cfg.num_mel_bins)
    pipeline = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))

    rng = np.random.default_rng(0)
    # audio pre-staged on device: in this environment host<->device rides a
    # slow debug tunnel (~45 MB/s; 15 MB/batch would dominate the measurement
    # at ~340 ms/batch), whereas a production TPU host moves this over PCIe
    # in ~2 ms. The reference likewise measures with inputs resident
    # (examples/whisper/run.py:268 does .cuda() once per utterance on local
    # PCIe).
    audio_batches = [
        jax.device_put(
            rng.standard_normal((BATCH, N_SAMPLES)).astype(np.float32) * 0.1
        )
        for _ in range(N_BATCHES)
    ]

    def run_pass(p, dtype, pipe=None):
        t0 = time.perf_counter()
        last = None
        for audio in audio_batches:
            mel = frontend.jit()(audio).astype(dtype)
            last, _ = (pipe or pipeline)(p, mel)
        # fetch a scalar: a real D2H dependency is the only reliable
        # completion barrier on this platform (block_until_ready has been
        # observed to return early through the device tunnel)
        np.asarray(last[0, -1])
        return time.perf_counter() - t0

    # headline dtype is bf16 — the TPU-native serving precision (the
    # reference's fp32 was a GPU-contest choice; fp32 is opt-in to keep the
    # cold-compile budget down: each pipeline shape costs minutes through
    # this environment's remote-compile tunnel)
    run_pass(params16, jnp.bfloat16)               # warmup (compile)
    total_audio_s = BATCH * N_BATCHES * AUDIO_SECONDS_PER_UTT
    # >=3 in-process repeats: the headline is the median and the min/max
    # spread rides the JSON line, so a machine-variance dip is
    # self-diagnosing instead of reading as a silent regression
    # (VERDICT r3 weak 2: r02->r03 dropped 13.7% unremarked)
    rates = sorted(total_audio_s / run_pass(params16, jnp.bfloat16)
                   for _ in range(3))
    audio_s_per_s_bf16 = rates[1]
    elapsed16 = total_audio_s / audio_s_per_s_bf16

    # compat series: bf16-KV (the r1-r3 headline precision) at the same
    # batch — bf16-KV is batch-saturated (b16 10.71k / b32 10.79k / b64
    # 11.00k in the round-4 sweep) so this remains comparable to the b16
    # numbers of earlier rounds
    gen_compat = GenerationConfig(max_new_tokens=GEN_TOKENS)
    pipe_compat = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen_compat))
    run_pass(params16, jnp.bfloat16, pipe_compat)      # warmup (compile)
    # same median-of-3 + spread protocol as the headline (ADVICE r4: the
    # series whose purpose is cross-round comparability must not be the one
    # single-pass number left exposed to session variance)
    compat_rates = sorted(total_audio_s / run_pass(params16, jnp.bfloat16,
                                                   pipe_compat)
                          for _ in range(3))
    compat_aps = compat_rates[1]

    audio_s_per_s = None
    if os.environ.get("WHISPER_TPU_BENCH_FP32") == "1":
        params = jax.device_put(init_params(cfg, seed=0))
        run_pass(params, jnp.float32, pipe_compat)   # fp32 + float KV
        elapsed = run_pass(params, jnp.float32, pipe_compat)
        audio_s_per_s = total_audio_s / elapsed

    # p50 latency per single utterance (batch=1, bf16)
    mel1 = frontend.jit()(jnp.zeros((1, N_SAMPLES), jnp.float32)).astype(jnp.bfloat16)
    pipeline(params16, mel1)[0].block_until_ready()  # compile batch=1
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        toks, _ = pipeline(params16, mel1)
        np.asarray(toks[0, -1])                      # hard D2H sync
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    # ---- MFU / roofline (needs no estimated external baseline: model
    # FLOPs and minimum HBM traffic are architecture facts, chip peaks are
    # published constants — VERDICT r1 item 7) ----
    from whisper_trtllm_tpu.benchmarks import roofline

    kind = jax.devices()[0].device_kind
    peak_tflops, hbm_gbps = roofline.chip_peaks(kind)
    flops_utt = roofline.pipeline_flops_per_utt(cfg, GEN_TOKENS)
    achieved_tflops = (flops_utt * BATCH * N_BATCHES) / elapsed16 / 1e12
    mfu = (achieved_tflops / peak_tflops) if peak_tflops else None
    # decode-phase HBM picture at the headline batch, mid-decode cache len
    # (bf16 weights, int8 KV storage — the headline serving config)
    bytes_step = roofline.decode_bytes_per_step(cfg, BATCH, GEN_TOKENS // 2,
                                                kv_bytes=1.0,
                                                kv_scale_bytes=4.0)
    decode_hbm_floor_ms = (
        GEN_TOKENS * bytes_step / (hbm_gbps * 1e9) * 1e3 if hbm_gbps else None)

    # ---- per-size sections (VERDICT r2 order 2 / r4 order 7): the
    # serving-realistic sizes must be driver-visible, not hand-run scripts
    # (the reference reports per-size speed, README.md:93-98). Best known
    # config for both (docs/PERFORMANCE.md model-size grid): int8 weights +
    # int8 KV (T-minor), bf16 compute, batch 16. ----
    def size_section(preset, s_batch, s_batches):
        from whisper_trtllm_tpu.quantization.quantize import (
            weight_only_quantize,
        )

        scfg = dataclasses.replace(WhisperConfig.preset(preset),
                                   eos_token_id=-1)
        sparams = weight_only_quantize(init_params(scfg, seed=0))
        sparams = jax.device_put(cast_params(sparams, jnp.bfloat16))
        sgen = GenerationConfig(max_new_tokens=GEN_TOKENS,
                                kv_cache_dtype="int8")
        spipe = jax.jit(lambda p, m: transcribe_tokens(p, scfg, m, sgen))
        s_mels = [
            jax.device_put(jnp.asarray(
                rng.standard_normal(
                    (s_batch, 2 * scfg.max_source_positions,
                     scfg.num_mel_bins)) * 0.5, jnp.bfloat16))
            for _ in range(s_batches)
        ]

        def s_pass():
            t0 = time.perf_counter()
            last = None
            for mel in s_mels:
                last, _ = spipe(sparams, mel)
            np.asarray(last[0, -1])                  # hard D2H sync
            return time.perf_counter() - t0

        s_pass()                                     # warmup (compile)
        s_elapsed = s_pass()
        s_audio = s_batch * s_batches * AUDIO_SECONDS_PER_UTT
        s_aps = s_audio / s_elapsed
        s_flops = roofline.pipeline_flops_per_utt(scfg, GEN_TOKENS)
        s_tflops = (s_flops * s_batch * s_batches) / s_elapsed / 1e12
        s_bytes_step = roofline.decode_bytes_per_step(
            scfg, s_batch, GEN_TOKENS // 2, weight_bytes=1.0, kv_bytes=1.0,
            kv_scale_bytes=4.0)
        # decode-phase split: encoder+cross-KV timed separately so the
        # roofline fraction refers to the decode loop it bounds
        from whisper_trtllm_tpu.models.whisper import model as wmodel

        senc = jax.jit(lambda p, m: wmodel.encode(p, scfg, m))
        np.asarray(senc(sparams, s_mels[0])[0, 0, 0])   # compile + sync
        t0 = time.perf_counter()
        e = senc(sparams, s_mels[0])
        np.asarray(e[0, 0, 0])
        s_enc_s = time.perf_counter() - t0
        s_decode_s = s_elapsed / s_batches - s_enc_s
        s_floor_s = (GEN_TOKENS * s_bytes_step / (hbm_gbps * 1e9)
                     if hbm_gbps else None)
        return {
            "audio_s_per_s": round(s_aps, 1),
            "config": f"int8 weights + int8 KV, bf16, batch {s_batch}",
            "mfu": (round(s_tflops / peak_tflops, 4) if peak_tflops
                    else None),
            "achieved_tflops": round(s_tflops, 2),
            "decode_ms_per_batch": round(s_decode_s * 1e3, 1),
            "decode_hbm_floor_ms": (round(s_floor_s * 1e3, 1)
                                    if s_floor_s else None),
            "decode_roofline_frac": (round(s_floor_s / s_decode_s, 3)
                                     if s_floor_s and s_decode_s > 0
                                     else None),
        }

    medium = None
    if os.environ.get("WHISPER_TPU_BENCH_MEDIUM", "1") != "0":
        medium = size_section("medium.en", 16, 2)
    # large-v3 (VERDICT r4 order 7): memory-fit-guarded — int8 W+KV b16
    # fits one v5e chip (docs/PERFORMANCE.md round-4 section); on a smaller
    # device the section reports the failure instead of killing the line
    large = None
    if os.environ.get("WHISPER_TPU_BENCH_LARGE", "1") != "0":
        try:
            large = size_section("large-v3", 16, 2)
        except Exception as e:  # noqa: BLE001 — OOM/compile-limit guard
            large = {"skipped": f"{type(e).__name__}: {str(e)[:160]}"}

    gate = _tpu_check_gate()

    baseline = TARGET_MULTIPLIER * HF_GPU_AUDIO_S_PER_S
    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(audio_s_per_s_bf16, 2),
        "headline_spread": {"min": round(rates[0], 2),
                            "max": round(rates[-1], 2), "n": len(rates)},
        "unit": "audio-s/s",
        "vs_baseline": round(audio_s_per_s_bf16 / baseline, 3),
        "config": "bf16 weights + int8 KV (T-minor), batch 32",
        "bf16_kv_audio_s_per_s": round(compat_aps, 2),
        "bf16_kv_spread": {"min": round(compat_rates[0], 2),
                           "max": round(compat_rates[-1], 2),
                           "n": len(compat_rates)},
        "model_gflops_per_utt": round(flops_utt / 1e9, 2),
        "achieved_tflops": round(achieved_tflops, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "peak_bf16_tflops": peak_tflops,
        "decode_bytes_per_step": int(bytes_step),  # at the headline batch
        "decode_hbm_floor_ms_per_batch": (round(decode_hbm_floor_ms, 2)
                                          if decode_hbm_floor_ms else None),
        "fp32_audio_s_per_s": (round(audio_s_per_s, 2)
                               if audio_s_per_s else "set WHISPER_TPU_BENCH_FP32=1"),
        "p50_latency_ms_batch1": round(p50_ms, 2),
        "model": "whisper-tiny.en (random weights)",
        "batch": BATCH,
        "utterances": BATCH * N_BATCHES,
        "gen_tokens_per_utt": GEN_TOKENS,
        "backend": jax.default_backend(),
        "baseline_def": "1.5x estimated HF-GPU tiny.en e2e (30 audio-s/s)",
        "medium": medium,
        "large": large,
        "tpu_check": gate,
    }))
    return 0 if gate["status"] in ("pass", "skipped (env)") else 1


if __name__ == "__main__":
    raise SystemExit(main())
