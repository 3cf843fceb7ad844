#!/bin/sh
# Round-5 extension: medium.en-dim speculative TARGET on the same corpus.
# The tiny-target (0.47x) -> base-target (0.93x) trend confirmed step-cost
# asymmetry as the lever; medium dims are the configuration VERDICT r4
# called "near-certain". Training is transfer-bound on this transport
# (~0.25-0.4 s/step at every size), so medium costs about what tiny did.
set -e
SYNTH=${1:-/tmp/wtpu_synth5}
cd "$(dirname "$0")/.."

echo "=== STAGE medium_init $(date +%H:%M:%S)"
python scripts/make_init_ckpt.py --preset medium.en --seed 11 \
  --output "$SYNTH/ckpt_medium_init"
echo "=== STAGE medium_pretrain $(date +%H:%M:%S)"
python scripts/pretrain_encoder.py --checkpoint "$SYNTH/ckpt_medium_init" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_medium_pre" \
  --steps 2000 --remat --batch 8
echo "=== STAGE medium_finetune $(date +%H:%M:%S)"
python -m cli.finetune --checkpoint "$SYNTH/ckpt_medium_pre" \
  --dataset "$SYNTH/train_all.pkl" --output "$SYNTH/ckpt_medium_ft" \
  --guided-attn 2.0 --guided-attn-anneal 4 --epochs 8 --lr 3e-4 \
  --save-every 1 --remat
echo "=== STAGE spec_medium $(date +%H:%M:%S)"
python scripts/spec_bench.py --target "$SYNTH/ckpt_medium_ft" \
  --draft "$SYNTH/ckpt_micro_ft" --wav-dir "$SYNTH/eval_wavs" \
  --utts 16 --gammas 2,4,6,8 --max-new-tokens 96 \
  | tee "$SYNTH/spec_medium.jsonl"
echo "=== MEDIUM_DONE $(date +%H:%M:%S)"
