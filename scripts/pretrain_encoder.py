"""Frame-supervised encoder pretraining for the synthetic-ASR acceptance loop.

Round-4 diagnosis: from-scratch seq2seq training on the synthetic corpus
deadlocks — cross-attention stays uniform because encoder features carry no
word identity (linear probe at chance), and the encoder can't learn
identity because the only gradient reaches it through that uniform
attention (bag-of-words only). Real Whisper breaks this with ~680k hours
of data and ~1M steps; offline we have something better: the corpus is
synthetic, so the TRUE frame alignment is known (word k of a sentence
occupies a fixed 0.3 s slot — cli/synthetic_asr.py::sentence_audio).

This script trains encoder parameters (plus a throwaway linear head) with
per-position cross-entropy against those frame labels (33 classes: 32
words + silence) — the supervised analog of a CTC/alignment pretrain. A
few hundred steps make encoder features linearly word-separable, after
which cli/finetune's seq2seq training has discriminative keys/values to
align against and converges instead of creeping at the word-uniform
plateau.

  python scripts/pretrain_encoder.py --checkpoint ckpt_in --dataset train.pkl \
      --output ckpt_out [--steps 800] [--batch 16] [--lr 1e-3]

The head is dropped from the saved checkpoint; only encoder weights move
(optax.adam masked to the encoder subtree — adamw's weight decay would
silently shrink the untouched decoder).
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, ".")

LEAD_S = 0.1      # sentence_audio lead-in
WORD_S = 0.3      # per-word slot (2 tones 0.12 s + 0.06 s gap)
TONE_S = 0.24     # the voiced part of the slot
POS_PER_S = 50    # 100 mel frames/s, conv stride 2
WORD_ID_BASE = 100
N_WORDS = 32


def frame_labels(ids, n_pos: int) -> np.ndarray:
    """Per-encoder-position class labels for one utterance: 0 = silence,
    1..N_WORDS = word index + 1. ids = [sot, notime, words..., eos]."""
    lab = np.zeros((n_pos,), np.int32)
    words = [t - WORD_ID_BASE for t in ids
             if WORD_ID_BASE <= t < WORD_ID_BASE + N_WORDS]
    for k, w in enumerate(words):
        a = int((LEAD_S + k * WORD_S) * POS_PER_S)
        b = int((LEAD_S + k * WORD_S + TONE_S) * POS_PER_S)
        lab[a:b] = w + 1
    return lab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="per-layer encoder rematerialization — required at "
                    "medium+ dims (61 GB activation OOM at b16 without it)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from whisper_trtllm_tpu.models.whisper import model as wmodel
    from whisper_trtllm_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params, cfg = load_checkpoint(args.checkpoint)
    with open(args.dataset, "rb") as f:
        data = pickle.load(f)
    n_pos = cfg.max_source_positions

    rng = np.random.default_rng(0)
    head = {
        "w": (rng.standard_normal((cfg.d_model, N_WORDS + 1)) /
              np.sqrt(cfg.d_model)).astype(np.float32),
        "b": np.zeros((N_WORDS + 1,), np.float32),
    }
    state = {"params": params, "head": jax.tree_util.tree_map(jnp.asarray,
                                                              head)}

    def loss_fn(st, mel, labels):
        enc = wmodel.encode(st["params"], cfg, mel,
                            remat=args.remat)           # (B, P, d)
        logits = enc @ st["head"]["w"] + st["head"]["b"]  # (B, P, 33)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        # class balance: silence dominates positions ~2:1 at dense sentences
        # and ~50:1 at short ones; weight word positions up
        w = jnp.where(labels > 0, 1.0, 0.1)
        acc = (logits.argmax(-1) == labels).mean()
        return jnp.sum(nll * w) / jnp.sum(w), acc

    # only the encoder subtree (+ head) trains; adam (not adamw) so the
    # frozen decoder is bit-identical after pretraining
    def mask_tree(st):
        # match the TOP-LEVEL "encoder" subtree only: a substring test on
        # the whole path also catches decoder/layers/encoder_attn (the
        # decoder's cross-attention), violating the frozen-decoder
        # guarantee the moment this loss ever touches the decoder
        return {
            "params": jax.tree_util.tree_map_with_path(
                lambda p, _: getattr(p[0], "key", None) == "encoder",
                st["params"]),
            "head": jax.tree_util.tree_map(lambda _: True, st["head"]),
        }

    opt = optax.masked(optax.adam(args.lr), mask_tree(state))
    opt_state = opt.init(state)

    @jax.jit
    def step(st, opt_state, mel, labels):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            st, mel, labels)
        updates, opt_state = opt.update(grads, opt_state, st)
        return optax.apply_updates(st, updates), opt_state, loss, acc

    n = len(data)
    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, n, args.batch)
        mel = np.stack([np.asarray(data[j][0], np.float32) for j in idx])
        labels = np.stack([frame_labels(data[j][1], n_pos) for j in idx])
        state, opt_state, loss, acc = step(state, opt_state, mel, labels)
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: frame-CE {float(loss):.4f} "
                  f"frame-acc {float(acc):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    save_checkpoint(args.output, jax.device_get(state["params"]), cfg)
    print(f"saved encoder-pretrained checkpoint to {args.output}")


if __name__ == "__main__":
    main()
