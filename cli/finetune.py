"""Fine-tuning CLI: adapt a Whisper checkpoint on (mel, token) pairs.

Beyond the reference (inference-only): a minimal but real training driver on
the sharded train step (training/train.py) — DP over 'data', optional TP
over 'model', remat for memory, checkpoint save per epoch.

Usage:
  python -m cli.finetune --checkpoint engines/tiny.en --dataset train.pkl \
      --output engines/tiny.en-ft [--epochs 1] [--batch 8] [--lr 1e-5] \
      [--data-parallel N] [--model-parallel M] [--remat]

The dataset pickle holds (mel (3000, M) float32, token_ids list[int]) pairs
(token ids must include decoder_start and EOS).
"""

from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def _pad_tokens(seqs, pad_id, max_len):
    out = np.full((len(seqs), max_len), pad_id, np.int32)
    mask = np.zeros((len(seqs), max_len - 1), np.float32)
    for i, s in enumerate(seqs):
        s = np.asarray(s, np.int32)[:max_len]
        out[i, : len(s)] = s
        mask[i, : max(len(s) - 1, 0)] = 1.0
    return out, mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--warmup-steps", type=int, default=0,
                    help="linear warmup to --lr then cosine decay to lr/20 "
                    "over the run (from-scratch training needs this: flat "
                    "3e-4 from step 0 left tiny.en stuck at the word-"
                    "uniform plateau on the synthetic corpus)")
    ap.add_argument("--augment-mel", type=float, default=0.0,
                    help="per-batch gaussian noise added to the input mels "
                    "(std, in log-mel units) - prevents the model from "
                    "memorizing per-utterance noise fingerprints instead "
                    "of word acoustics")
    ap.add_argument("--max-target-len", type=int, default=128)
    ap.add_argument("--guided-attn", type=float, default=0.0,
                    help="guided cross-attention LOSS scale (synthetic "
                    "corpus only: the true monotonic alignment is known; "
                    "TTS-style attention-mass penalty, training/train.py::"
                    "guided_attn_weights — the gradient flows into q/k so "
                    "the alignment survives the prior's removal). 0 "
                    "disables")
    ap.add_argument("--guided-attn-anneal", type=int, default=4,
                    help="linearly anneal the guided-attention weight to 0 "
                    "over this many epochs, so later epochs (and inference, "
                    "which never sees the bias) run on internalized "
                    "alignment")
    ap.add_argument("--save-every", type=int, default=0,
                    help="also save the checkpoint every N epochs (long "
                    "runs: lets the caller stop at convergence without "
                    "losing the run)")
    ap.add_argument("--data-parallel", type=int, default=1)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the environment's "
                    "sitecustomize pins a TPU otherwise)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        try:  # must precede first backend use
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:  # cold TPU compiles ride a slow remote tunnel; persist them
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_trtllm_tpu.config import MeshConfig
    from whisper_trtllm_tpu.parallel import make_mesh, shard_params
    from whisper_trtllm_tpu.training import make_train_step
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params, cfg = load_checkpoint(args.checkpoint)
    with open(args.dataset, "rb") as f:
        data = pickle.load(f)

    mesh = None
    if args.data_parallel * args.model_parallel > 1:
        mesh = make_mesh(MeshConfig(args.data_parallel, args.model_parallel))
        params = shard_params(params, mesh)

    n = len(data)
    steps_per_epoch = max((n - args.batch) // args.batch + 1, 1)
    if args.warmup_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=args.lr / 100.0, peak_value=args.lr,
            warmup_steps=args.warmup_steps,
            decay_steps=max(args.epochs * steps_per_epoch, args.warmup_steps + 1),
            end_value=args.lr / 20.0)
        opt = optax.adamw(schedule)
    else:
        opt = optax.adamw(args.lr)
    init_opt, step = make_train_step(
        cfg, opt, mesh=mesh, remat=args.remat
    )
    opt_state = init_opt(params)

    from whisper_trtllm_tpu.training import guided_attn_weights

    # device-resident once: passing host numpy would re-upload the
    # (S-1, 1500) matrix on every training step
    ga_w = (jax.device_put(guided_attn_weights(args.max_target_len - 1,
                                               cfg.max_source_positions))
            if args.guided_attn > 0 else None)

    aug_rng = np.random.default_rng(12345)
    for epoch in range(args.epochs):
        gw = args.guided_attn * max(
            0.0, 1.0 - epoch / max(args.guided_attn_anneal, 1))
        epoch_ga_w = ga_w if gw > 0 else None
        ga_scale = (jax.numpy.asarray(gw, jax.numpy.float32)
                    if gw > 0 else None)
        perm = np.random.default_rng(epoch).permutation(n)
        losses = []
        t0 = time.time()
        for i in range(0, n - args.batch + 1, args.batch):
            idx = perm[i : i + args.batch]
            mel = np.stack([np.asarray(data[j][0], np.float32) for j in idx])
            if mel.shape[1] == cfg.num_mel_bins:      # (M, T) → (T, M)
                mel = mel.transpose(0, 2, 1)
            if args.augment_mel > 0.0:
                mel = mel + aug_rng.standard_normal(
                    mel.shape).astype(np.float32) * args.augment_mel
            tokens, mask = _pad_tokens(
                [data[j][1] for j in idx], cfg.pad_token_id, args.max_target_len
            )
            if mesh is not None:
                ds = NamedSharding(mesh, P("data"))
                mel = jax.device_put(mel, ds)
                tokens = jax.device_put(tokens, ds)
                mask = jax.device_put(mask, ds)
            params, opt_state, loss = step(params, opt_state, mel, tokens,
                                           mask, epoch_ga_w, ga_scale)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({len(losses)} steps, {time.time() - t0:.1f}s"
              + (f", guided-attn {gw:.3f}" if args.guided_attn else "")
              + ")", flush=True)
        if args.save_every and (epoch + 1) % args.save_every == 0:
            save_checkpoint(args.output, params, cfg)
            print(f"  checkpoint saved at epoch {epoch}", flush=True)

    save_checkpoint(args.output, params, cfg)
    print(f"saved fine-tuned checkpoint to {args.output}")


if __name__ == "__main__":
    main()
