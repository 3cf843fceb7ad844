#!/bin/sh
# Round-5 trained-weight stack on ONE synthetic corpus (cli/synthetic_asr):
#   1. tiny.en target   — acceptance gate (ACCEPT_r5.json) + the durable
#                         committed artifact (VERDICT r4 orders 1-2)
#   2. 2L/d192 micro draft (scripts/make_init_ckpt.py --micro-draft)
#   3. speculative wall-clock, tiny target   (scripts/spec_bench.py)
#   4. base.en-dim target
#   5. speculative wall-clock, base target   — the step-cost-asymmetry
#      regime the round-4 tiny-target negative pointed at
# Recipe per model = the proven round-4 pipeline (docs/PERFORMANCE.md):
# frame-supervised encoder pretrain 2000 steps -> guided-attention finetune
# (2.0, annealed over 4 of 8 epochs, lr 3e-4).
# Corpus layout expected under $SYNTH (made by scripts/make_corpus_r5.sh):
#   train_all.pkl (4096 long + 2048 short utts), eval_wavs/, hf/, ckpt_init,
#   ckpt_micro_init, ckpt_base_init
set -e
SYNTH=${1:-/tmp/wtpu_synth5}
cd "$(dirname "$0")/.."

echo "=== STAGE tiny_pretrain $(date +%H:%M:%S)"
python scripts/pretrain_encoder.py --checkpoint "$SYNTH/ckpt_init" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_pre" --steps 2000
echo "=== STAGE tiny_finetune $(date +%H:%M:%S)"
python -m cli.finetune --checkpoint "$SYNTH/ckpt_pre" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_ft" \
  --guided-attn 2.0 --guided-attn-anneal 4 --epochs 8 --lr 3e-4 \
  --save-every 1
echo "=== STAGE tiny_accept $(date +%H:%M:%S)"
sh scripts/run_accept_r4.sh "$SYNTH" "$SYNTH/ckpt_ft" ACCEPT_r5.json

echo "=== STAGE micro_pretrain $(date +%H:%M:%S)"
python scripts/pretrain_encoder.py --checkpoint "$SYNTH/ckpt_micro_init" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_micro_pre" \
  --steps 2000
echo "=== STAGE micro_finetune $(date +%H:%M:%S)"
python -m cli.finetune --checkpoint "$SYNTH/ckpt_micro_pre" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_micro_ft" \
  --guided-attn 2.0 --guided-attn-anneal 4 --epochs 8 --lr 3e-4 \
  --save-every 1
echo "=== STAGE spec_tiny $(date +%H:%M:%S)"
python scripts/spec_bench.py --target "$SYNTH/ckpt_ft" \
  --draft "$SYNTH/ckpt_micro_ft" --wav-dir "$SYNTH/eval_wavs" \
  --utts 16 --gammas 2,4,6 --max-new-tokens 96 \
  | tee "$SYNTH/spec_tiny.jsonl"

echo "=== STAGE base_pretrain $(date +%H:%M:%S)"
python scripts/pretrain_encoder.py --checkpoint "$SYNTH/ckpt_base_init" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_base_pre" \
  --steps 2000
echo "=== STAGE base_finetune $(date +%H:%M:%S)"
python -m cli.finetune --checkpoint "$SYNTH/ckpt_base_pre" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_base_ft" \
  --guided-attn 2.0 --guided-attn-anneal 4 --epochs 8 --lr 3e-4 \
  --save-every 1
echo "=== STAGE spec_base $(date +%H:%M:%S)"
python scripts/spec_bench.py --target "$SYNTH/ckpt_base_ft" \
  --draft "$SYNTH/ckpt_micro_ft" --wav-dir "$SYNTH/eval_wavs" \
  --utts 16 --gammas 2,4,6 --max-new-tokens 96 \
  | tee "$SYNTH/spec_base.jsonl"
echo "=== STACK_DONE $(date +%H:%M:%S)"
