#!/bin/sh
# Round-5 on-chip measurement suite — run on an IDLE machine (no training,
# no CPU pytest: host contention measurably pollutes dispatch timing on
# this transport). Stages ordered so the kernel gate runs first (the
# kernel-tree digest changed this round) and the cheapest measurements
# land early.
set -e
cd "$(dirname "$0")/.."
SYNTH=${1:-/tmp/wtpu_synth5}
OUT=${2:-/tmp/wtpu_r5_logs}
mkdir -p "$OUT"

echo "=== tpu_check $(date +%H:%M:%S)"
python -m cli.tpu_check | tee "$OUT/tpu_check.json"

echo "=== spec_loop_cost (greedy-baseline anomaly, order 5) $(date +%H:%M:%S)"
python scripts/spec_loop_cost.py --utts 8 | tee "$OUT/spec_loop_cost.jsonl"

echo "=== encoder roofline: medium $(date +%H:%M:%S)"
python scripts/encoder_roofline.py --preset medium.en --batch 16 \
  --lever stem-matmul --lever flash-bq | tee "$OUT/enc_medium.jsonl"

echo "=== encoder roofline: large-v3 $(date +%H:%M:%S)"
python scripts/encoder_roofline.py --preset large-v3 --batch 16 \
  --lever stem-matmul | tee "$OUT/enc_large.jsonl"

echo "=== zoo benchmark (order 3) $(date +%H:%M:%S)"
python -m whisper_trtllm_tpu.benchmarks.benchmark \
  --model bert_base --batch 8 --dtype bfloat16 --in-len 384 --iters 10 \
  | tee "$OUT/zoo.jsonl"
python -m whisper_trtllm_tpu.benchmarks.benchmark \
  --model gpt_350m --batch 8 --dtype bfloat16 --in-len 128 \
  --gen-tokens 128 --iters 5 | tee -a "$OUT/zoo.jsonl"
python -m whisper_trtllm_tpu.benchmarks.benchmark \
  --model llama_7b --batch 8 --dtype bfloat16 --in-len 128 \
  --gen-tokens 128 --iters 3 --quant int8 | tee -a "$OUT/zoo.jsonl"

echo "=== serving load test A/B (order 6) $(date +%H:%M:%S)"
python scripts/serve_loadtest.py --checkpoint "$SYNTH/ckpt_ft" \
  --wav-dir "$SYNTH/eval_wavs" --backend ifb --clients 16 --requests 64 \
  --max-new-tokens 96 | tee "$OUT/load_ifb_auto.json"
python scripts/serve_loadtest.py --checkpoint "$SYNTH/ckpt_ft" \
  --wav-dir "$SYNTH/eval_wavs" --backend ifb --clients 16 --requests 64 \
  --max-new-tokens 96 --kv-cache-dtype int8 | tee "$OUT/load_ifb_int8.json"
python scripts/serve_loadtest.py --checkpoint "$SYNTH/ckpt_ft" \
  --wav-dir "$SYNTH/eval_wavs" --backend slots --clients 16 --requests 64 \
  --max-new-tokens 96 --kv-cache-dtype int8 | tee "$OUT/load_slots_int8.json"

echo "=== spec_tiny re-run (packed-sync harness) $(date +%H:%M:%S)"
python scripts/spec_bench.py --target "$SYNTH/ckpt_ft" \
  --draft "$SYNTH/ckpt_micro_ft" --wav-dir "$SYNTH/eval_wavs" \
  --utts 16 --gammas 2,4,6 --max-new-tokens 96 \
  | tee "$OUT/spec_tiny_packed.jsonl"

echo "=== trained-weight drift (re-anchored from this round's checkpoint) $(date +%H:%M:%S)"
python scripts/drift_study.py --checkpoint "$SYNTH/ckpt_ft" \
  --audio-dir "$SYNTH/eval_wavs" --utts 32 --seeds 1 \
  | tee "$OUT/drift_r5.json" || true

echo "=== bench.py (headline + medium + NEW large object) $(date +%H:%M:%S)"
python bench.py | tee "$OUT/bench.json"

echo "=== SUITE_DONE $(date +%H:%M:%S)"
