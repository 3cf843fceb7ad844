"""Data-parallel scaling-efficiency report.

BASELINE.md asks for audio-seconds/s scaling efficiency at 1 chip, 1 host and
N hosts. This harness runs the jitted pipeline over a ('data','model') mesh
for a ladder of device counts and reports throughput + efficiency vs the
single-device baseline. On a multi-host slice, call
parallel.mesh.initialize_distributed() first; on a single machine it also
runs on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N)
— cluster-free distributed measurement the reference lacks (SURVEY.md §4).

Usage:
  python -m whisper_trtllm_tpu.benchmarks.scaling --model tiny.en \
      --devices 1 2 4 8 --per-device-batch 4 [--model-parallel 1]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def measure(model: str, n_devices: int, per_device_batch: int,
            model_parallel: int, gen_tokens: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_trtllm_tpu.config import (
        GenerationConfig, MeshConfig, WhisperConfig,
    )
    from whisper_trtllm_tpu.models.whisper import init_params
    from whisper_trtllm_tpu.parallel import make_mesh, shard_params
    from whisper_trtllm_tpu.runtime.generation import transcribe_tokens

    cfg = dataclasses.replace(WhisperConfig.preset(model), eos_token_id=-1)
    gen = GenerationConfig(max_new_tokens=gen_tokens)
    data_ax = n_devices // model_parallel
    mesh = make_mesh(
        MeshConfig(data=data_ax, model=model_parallel),
        devices=jax.devices()[:n_devices],
    )
    params = shard_params(init_params(cfg, seed=0), mesh)

    batch = per_device_batch * data_ax
    rng = np.random.default_rng(0)
    mel = jax.device_put(
        rng.standard_normal(
            (batch, 2 * cfg.max_source_positions, cfg.num_mel_bins)
        ).astype(np.float32),
        NamedSharding(mesh, P("data")),
    )

    fn = jax.jit(lambda p, m: transcribe_tokens(p, cfg, m, gen))
    with mesh:
        fn(params, mel)[0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out, _ = fn(params, mel)
        out.block_until_ready()
    elapsed = (time.perf_counter() - t0) / iters
    return {
        "devices": n_devices,
        "mesh": f"data={data_ax} model={model_parallel}",
        "batch": batch,
        "audio_s_per_s": round(batch * 30.0 / elapsed, 1),
        "latency_ms": round(elapsed * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny.en")
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--gen-tokens", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    avail = len(jax.devices())
    base = None
    for n in args.devices:
        if n > avail:
            print(json.dumps({"devices": n, "skipped": f"only {avail} available"}))
            continue
        row = measure(args.model, n, args.per_device_batch,
                      args.model_parallel, args.gen_tokens, args.iters)
        if base is None:
            base = row["audio_s_per_s"] / row["devices"]
        row["scaling_efficiency"] = round(
            row["audio_s_per_s"] / (base * row["devices"]), 3
        )
        print(json.dumps(row))


if __name__ == "__main__":
    main()
