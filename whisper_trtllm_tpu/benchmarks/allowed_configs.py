"""Named per-model benchmark configurations for the zoo.

Analog of the reference's benchmark registry (reference:
benchmarks/allowed_configs.py — gpt_350m, gpt_175b, opt_350m, opt_66b,
llama_7b, llama_30b, gptj_6b, gptneox_20b, chatglm_6b, bert_base,
bert_large, plus SmoothQuant GPT variants): every name the reference's
benchmark CLI accepts exists here with the same architecture hyperparameters,
plus the per-run shape limits (max batch / input / output) the reference
carries per entry.

Quantized variants: the reference's ``gpt_350m_sq_*`` entries select
SmoothQuant engines; here any entry can be benchmarked with weight-only int8
via ``--quant int8`` (quantization.weight_only_quantize is model-agnostic),
so quantization is a flag, not a config fork.

``fits_one_v5e``: whether fp32/bf16 weights fit a single 16 GB v5e chip —
larger entries need a TP mesh (parallel/partition.py) or more chips; they
are kept so the registry covers the reference's list and multi-chip runs
can name them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class BenchConfig:
    family: str                      # whisper_trtllm_tpu.models.<family>
    model_kwargs: dict = field(default_factory=dict)
    max_batch_size: int = 256
    max_input_len: int = 512
    max_output_len: int = 200
    fits_one_v5e: bool = True        # bf16 weights < ~14 GB


ALLOWED_CONFIGS: dict[str, BenchConfig] = {
    # reference: benchmarks/allowed_configs.py:2-12
    "gpt_350m": BenchConfig(
        family="gpt",
        model_kwargs=dict(n_layer=24, n_head=16, d_model=1024,
                          ffn_dim=4096, vocab_size=51200, n_positions=1024),
        max_batch_size=256, max_input_len=512, max_output_len=200,
    ),
    # reference: benchmarks/allowed_configs.py:14-24
    "gpt_175b": BenchConfig(
        family="gpt",
        model_kwargs=dict(n_layer=96, n_head=96, d_model=12288,
                          ffn_dim=49152, vocab_size=51200, n_positions=2048),
        max_batch_size=64, fits_one_v5e=False,
    ),
    # reference: benchmarks/allowed_configs.py:54-66
    "opt_350m": BenchConfig(
        family="opt",
        model_kwargs=dict(n_layer=24, n_head=16, d_model=1024,
                          ffn_dim=4096, vocab_size=50272, max_positions=2048),
    ),
    # reference: benchmarks/allowed_configs.py:68-80
    "opt_66b": BenchConfig(
        family="opt",
        model_kwargs=dict(n_layer=64, n_head=72, d_model=9216,
                          ffn_dim=36864, vocab_size=50272,
                          max_positions=2048),
        max_batch_size=64, fits_one_v5e=False,
    ),
    # reference: benchmarks/allowed_configs.py:82-93
    "llama_7b": BenchConfig(
        family="llama",
        model_kwargs=dict(n_layer=32, n_head=32, n_kv_head=32, d_model=4096,
                          ffn_dim=11008, vocab_size=32000,
                          max_positions=2048),
        max_batch_size=128,
    ),
    # reference: benchmarks/allowed_configs.py:95-106
    "llama_30b": BenchConfig(
        family="llama",
        model_kwargs=dict(n_layer=60, n_head=52, n_kv_head=52, d_model=6656,
                          ffn_dim=17920, vocab_size=32000,
                          max_positions=2048),
        max_batch_size=64, fits_one_v5e=False,
    ),
    # reference: benchmarks/allowed_configs.py:108-119
    "gptj_6b": BenchConfig(
        family="gptj",
        model_kwargs=dict(n_layer=28, n_head=16, d_model=4096,
                          ffn_dim=16384, rotary_dim=64, vocab_size=50401,
                          max_positions=2048),
        max_batch_size=64,
    ),
    # reference: benchmarks/allowed_configs.py:121-132
    "gptneox_20b": BenchConfig(
        family="gptneox",
        model_kwargs=dict(n_layer=44, n_head=64, d_model=6144,
                          ffn_dim=24576, rotary_pct=0.25, vocab_size=50432,
                          max_positions=2048),
        max_batch_size=16, fits_one_v5e=False,
    ),
    # reference: benchmarks/allowed_configs.py:134-144
    "chatglm_6b": BenchConfig(
        family="chatglm6b",
        model_kwargs=dict(n_layer=28, n_head=32, d_model=4096,
                          ffn_dim=16384, vocab_size=130528,
                          max_positions=2048),
        max_batch_size=64,
    ),
    # reference: benchmarks/allowed_configs.py:146-158
    "bert_base": BenchConfig(
        family="bert",
        model_kwargs=dict(n_layer=12, n_head=12, d_model=768, ffn_dim=3072,
                          vocab_size=30522, max_position_embeddings=512),
        max_input_len=512, max_output_len=0,
    ),
    # reference: benchmarks/allowed_configs.py:160-171
    "bert_large": BenchConfig(
        family="bert",
        model_kwargs=dict(n_layer=24, n_head=16, d_model=1024, ffn_dim=4096,
                          vocab_size=30522, max_position_embeddings=512),
        max_input_len=512, max_output_len=0,
    ),
    # dev-scale entries (not in the reference): tiny dims for CI and for
    # exercising the harness without multi-minute compiles
    "gpt_tiny": BenchConfig(
        family="gpt",
        model_kwargs=dict(n_layer=2, n_head=4, d_model=64, ffn_dim=128,
                          vocab_size=512, n_positions=256),
        max_batch_size=8, max_input_len=32, max_output_len=32,
    ),
    "bert_tiny": BenchConfig(
        family="bert",
        model_kwargs=dict(n_layer=2, n_head=4, d_model=64, ffn_dim=128,
                          vocab_size=512, max_position_embeddings=128),
        max_input_len=64, max_output_len=0,
    ),
}


def build_model(name: str):
    """name → (family, config, init_params, generate_or_None, forward).

    Lazy imports keep CLI startup fast; every family exposes the same
    init_params/forward surface, causal families add generate()."""
    entry = ALLOWED_CONFIGS[name]
    fam = entry.family
    import importlib

    mod = importlib.import_module(f"whisper_trtllm_tpu.models.{fam}")
    cfg_cls = {
        "gpt": "GPTConfig", "opt": "OPTConfig", "llama": "LlamaConfig",
        "gptj": "GPTJConfig", "gptneox": "GPTNeoXConfig",
        "chatglm6b": "ChatGLM6BConfig", "bloom": "BloomConfig",
        "bert": "BertConfig",
    }[fam]
    cfg = getattr(mod, cfg_cls)(**entry.model_kwargs)
    generate = getattr(mod, "generate", None)
    return fam, cfg, mod.init_params, generate, mod.forward
