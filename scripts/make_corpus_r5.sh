#!/bin/sh
# Round-5 synthetic corpus: 4096 long (40-88 words) + 2048 short (8-24
# words) utterances merged into train_all.pkl, plus init checkpoints for
# every model the trained-weight stack uses (scripts/train_spec_stack.sh).
# CPU-only (the mel frontend runs on CPU by default) — safe to run while
# the chip is busy.
set -e
SYNTH=${1:-/tmp/wtpu_synth5}
cd "$(dirname "$0")/.."
python -m cli.synthetic_asr make --out "$SYNTH" --preset tiny.en \
  --train-n 4096 --eval-n 64 --seed 0
python -m cli.synthetic_asr make --out "${SYNTH}_short" --preset tiny.en \
  --train-n 2048 --eval-n 1 --seed 7 --min-words 8 --max-words 24
python - "$SYNTH" <<'EOF'
import pickle, random, sys
synth = sys.argv[1]
a = pickle.load(open(f"{synth}/train.pkl", "rb"))
b = pickle.load(open(f"{synth}_short/train.pkl", "rb"))
all_ = a + b
random.Random(0).shuffle(all_)
pickle.dump(all_, open(f"{synth}/train_all.pkl", "wb"))
print("merged", len(all_))
EOF
python scripts/make_init_ckpt.py --preset tiny.en --micro-draft --seed 3 \
  --output "$SYNTH/ckpt_micro_init"
python scripts/make_init_ckpt.py --preset base.en --seed 5 \
  --output "$SYNTH/ckpt_base_init"
echo CORPUS_DONE
