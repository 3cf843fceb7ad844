"""CLI smoke tests (the L7 apps layer, analog of reference EX/ scripts),
run in-process on tiny checkpoints."""

import json
import runpy
import sys

import numpy as np
import pytest

from whisper_trtllm_tpu.config import WhisperConfig
from whisper_trtllm_tpu.models.whisper import init_params
from whisper_trtllm_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "tiny-test"
    cfg = WhisperConfig.testing()
    save_checkpoint(str(path), init_params(cfg, 0), cfg)
    return str(path), cfg


def _run(module, argv):
    old = sys.argv
    sys.argv = [module.split(".")[-1]] + argv
    try:
        runpy.run_module(module, run_name="__main__")
    finally:
        sys.argv = old


def test_transcribe_cli_synthetic(checkpoint, capsys):
    path, cfg = checkpoint
    _run("cli.transcribe",
         ["--checkpoint", path, "--batch", "4", "--max-new-tokens", "6"])
    out = capsys.readouterr().out
    assert "audio-s/s" in out


def test_transcribe_cli_dataset(checkpoint, tmp_path, capsys, rng):
    import pickle

    path, cfg = checkpoint
    mels = [
        (rng.standard_normal(
            (2 * cfg.max_source_positions, cfg.num_mel_bins)
         ).astype(np.float32), f"text {i}")
        for i in range(3)
    ]
    ds = tmp_path / "ds.pkl"
    with open(ds, "wb") as f:
        pickle.dump(mels, f)
    _run("cli.transcribe",
         ["--checkpoint", path, "--dataset", str(ds), "--batch", "2",
          "--max-new-tokens", "5"])
    out = capsys.readouterr().out
    assert "3 utterances" in out


def test_benchmark_cli(capsys):
    _run("whisper_trtllm_tpu.benchmarks.benchmark",
         ["--model", "tiny_en", "--batch", "1", "--gen-tokens", "4",
          "--iters", "2"])
    out = capsys.readouterr().out
    assert "latency_ms_p50" in out and "audio_s_per_s" in out


def test_benchmark_cli_zoo(capsys):
    """Zoo benchmark path (the reference's gpt/bert benchmark CLIs,
    reference: benchmarks/{gpt,bert}_benchmark.py + allowed_configs.py)."""
    _run("whisper_trtllm_tpu.benchmarks.benchmark",
         ["--model", "gpt_tiny", "bert_tiny", "--batch", "2",
          "--gen-tokens", "4", "--in-len", "8", "--iters", "2"])
    out = capsys.readouterr().out
    assert "tokens_per_s" in out and "sequences_per_s" in out


def test_benchmark_cli_zoo_int8(capsys):
    _run("whisper_trtllm_tpu.benchmarks.benchmark",
         ["--model", "gpt_tiny", "--batch", "1", "--gen-tokens", "4",
          "--in-len", "8", "--iters", "1", "--quant", "int8"])
    out = capsys.readouterr().out
    assert '"quant": "int8"' in out


def test_allowed_configs_cover_reference_names():
    """Every model name the reference benchmark accepts exists here
    (reference: benchmarks/allowed_configs.py)."""
    from whisper_trtllm_tpu.benchmarks.allowed_configs import ALLOWED_CONFIGS

    for name in ["gpt_350m", "gpt_175b", "opt_350m", "opt_66b", "llama_7b",
                 "llama_30b", "gptj_6b", "gptneox_20b", "chatglm_6b",
                 "bert_base", "bert_large"]:
        assert name in ALLOWED_CONFIGS


def test_finetune_cli(checkpoint, tmp_path, capsys, rng):
    import pickle

    path, cfg = checkpoint
    data = [
        (rng.standard_normal(
            (2 * cfg.max_source_positions, cfg.num_mel_bins)
         ).astype(np.float32),
         [cfg.decoder_start_token_id, 11, 12, cfg.eos_token_id])
        for _ in range(4)
    ]
    ds = tmp_path / "train.pkl"
    with open(ds, "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "ft"
    _run("cli.finetune",
         ["--checkpoint", path, "--dataset", str(ds), "--output", str(out),
          "--batch", "2", "--epochs", "2", "--max-target-len",
          str(cfg.max_target_positions)])
    printed = capsys.readouterr().out
    assert "epoch 1" in printed and "saved fine-tuned checkpoint" in printed
    from whisper_trtllm_tpu.utils.checkpoint import load_checkpoint

    p2, cfg2 = load_checkpoint(str(out))
    assert cfg2 == cfg


def test_warm_cache_cli(checkpoint, capsys):
    path, cfg = checkpoint
    _run("cli.warm_cache",
         ["--checkpoint", path, "--batch", "1", "--gen-tokens", "4",
          "--cache-dir", "/tmp/wtpu_test_cache"])
    out = capsys.readouterr().out
    assert "warmed batch=1" in out


def test_run_zoo_cli(capsys):
    """Zoo runner (the reference's per-model examples/*/run.py analog)."""
    _run("cli.run_zoo",
         ["--family", "gpt", "--prompt-ids", "3", "4", "5",
          "--max-new-tokens", "4"])
    out = capsys.readouterr().out
    row = json.loads(out.strip().splitlines()[-1])
    assert row["family"] == "gpt" and len(row["output_ids"]) == 7


def test_run_zoo_cli_sampled(capsys):
    _run("cli.run_zoo",
         ["--family", "llama", "--prompt-ids", "3", "4",
          "--max-new-tokens", "3", "--sample", "--temperature", "0.7",
          "--top-k", "5"])
    out = capsys.readouterr().out
    row = json.loads(out.strip().splitlines()[-1])
    assert len(row["output_ids"]) == 5


def test_visualize_cli(checkpoint, tmp_path, capsys):
    """visualize CLI (≙ reference examples/gpt/visualize.py): dumps jaxpr,
    StableHLO and post-optimization HLO of the compiled pipeline."""
    path, cfg = checkpoint
    out = str(tmp_path / "graph")
    _run("cli.visualize",
         ["--checkpoint", path, "--out", out, "--max-new-tokens", "4"])
    jaxpr = open(out + ".jaxpr.txt").read()
    assert "while" in jaxpr                        # the on-device decode loop
    shlo = open(out + ".stablehlo.mlir").read()
    assert "stablehlo" in shlo or "mhlo" in shlo or "func.func" in shlo
    hlo = open(out + ".hlo.txt").read()
    assert "fusion" in hlo or "while" in hlo


def test_summarize_cli(tmp_path, capsys, monkeypatch):
    """summarize CLI (≙ reference examples/gpt/summarize.py): tiny random
    GPT-2 + an identity 'tokenizer' via monkeypatched transformers — checks
    the generate→decode→ROUGE plumbing and the JSON report."""
    import pickle

    import torch
    import transformers

    hf_cfg = transformers.GPT2Config(
        vocab_size=89, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        bos_token_id=2, eos_token_id=88)
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()

    class FakeTok:
        eos_token_id = 88

        def __call__(self, text, truncation=True, max_length=None):
            ids = [(3 + (ord(c) % 80)) for c in text][:max_length]
            return type("E", (), {"input_ids": ids})

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(f"t{i}" for i in ids)

    monkeypatch.setattr(transformers.AutoTokenizer, "from_pretrained",
                        staticmethod(lambda *_a, **_k: FakeTok()))
    monkeypatch.setattr(transformers.AutoModelForCausalLM, "from_pretrained",
                        staticmethod(lambda *_a, **_k: hf))

    ds = tmp_path / "pairs.pkl"
    with open(ds, "wb") as f:
        pickle.dump([("hello world", "t5 t6"), ("abc", "t7")], f)

    _run("cli.summarize",
         ["--dataset", str(ds), "--hf-model", "ignored",
          "--max-new-tokens", "4", "--max-input-len", "16",
          "--batch", "2", "--compare-hf"])
    import json

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n"] == 2
    assert 0.0 <= report["rouge1"] <= 1.0
    assert "hf" in report and 0.0 <= report["hf"]["rougeL"] <= 1.0
