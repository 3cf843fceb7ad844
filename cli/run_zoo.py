"""Run a zoo causal-LM: prompt in, generated tokens (and text) out.

Analog of the reference's per-model example runners (reference:
tensorrt_llm_july-release-v1/examples/{gpt,llama,bloom,gptj,gptneox,opt,
chatglm6b}/run.py — each deserializes an engine, tokenizes a prompt, runs
GenerationSession.decode, detokenizes). Here one CLI serves every family;
the "engine" is the jitted generate() per family + the persistent XLA
compilation cache.

Offline-friendly: --prompt-ids takes raw token ids (no tokenizer download
needed); --hf-model converts a *local* HF checkpoint directory and, when it
contains tokenizer files, --prompt text is tokenized/detokenized.

Examples:
  python -m cli.run_zoo --family gpt --prompt-ids 15496 11 995 \
      --max-new-tokens 32
  python -m cli.run_zoo --config gpt_350m --prompt-ids 1 2 3 --sample \
      --temperature 0.8 --top-p 0.95
  python -m cli.run_zoo --family llama --hf-model /ckpts/llama-7b \
      --prompt "The capital of France is"
"""

from __future__ import annotations

import argparse
import json


_FAMILIES = ("gpt", "llama", "opt", "gptj", "gptneox", "bloom", "chatglm6b")

_CONVERTERS = {
    "gpt": ("convert_hf_gpt2", "GPT2LMHeadModel"),
    "llama": ("convert_hf_llama", "LlamaForCausalLM"),
    "opt": ("convert_hf_opt", "OPTForCausalLM"),
    "gptj": ("convert_hf_gptj", "GPTJForCausalLM"),
    "gptneox": ("convert_hf_gptneox", "GPTNeoXForCausalLM"),
    "bloom": ("convert_hf_bloom", "BloomForCausalLM"),
}

_CFG_CLS = {
    "gpt": "GPTConfig", "llama": "LlamaConfig", "opt": "OPTConfig",
    "gptj": "GPTJConfig", "gptneox": "GPTNeoXConfig", "bloom": "BloomConfig",
    "chatglm6b": "ChatGLM6BConfig",
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--family", choices=_FAMILIES,
                     help="run with testing-dimension random weights")
    src.add_argument("--config", help="a benchmarks/allowed_configs.py name")
    ap.add_argument("--hf-model", default=None,
                    help="local HF checkpoint dir to convert (weights + "
                         "config; tokenizer if present)")
    ap.add_argument("--prompt", default=None, help="text (needs a tokenizer)")
    ap.add_argument("--prompt-ids", type=int, nargs="+", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=32)
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=0.0)
    ap.add_argument("--repetition-penalty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import importlib

    import jax
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/wtpu_xla_cache")
    except Exception:
        pass

    if args.config:
        from whisper_trtllm_tpu.benchmarks.allowed_configs import build_model

        fam, cfg, init_params, generate, _ = build_model(args.config)
        mod = importlib.import_module(f"whisper_trtllm_tpu.models.{fam}")
    else:
        fam = args.family
        mod = importlib.import_module(f"whisper_trtllm_tpu.models.{fam}")
        cfg = getattr(mod, _CFG_CLS[fam]).testing() if not args.hf_model \
            else None
        init_params, generate = mod.init_params, mod.generate
    if generate is None:
        raise SystemExit(f"{fam} has no generate() (encoder-only)")

    tokenizer = None
    if args.hf_model:
        import transformers

        if fam not in _CONVERTERS:
            raise SystemExit(
                f"{fam}: no transformers-class converter (chatglm-6b is a "
                "trust_remote_code model; use models.chatglm6b."
                "convert_hf_chatglm6b on its state_dict directly)")
        conv_name, hf_cls = _CONVERTERS[fam]
        hf = getattr(transformers, hf_cls).from_pretrained(args.hf_model)
        params, cfg = getattr(mod, conv_name)(hf)
        try:
            tokenizer = transformers.AutoTokenizer.from_pretrained(
                args.hf_model)
        except Exception:
            tokenizer = None
    else:
        params = init_params(cfg, seed=0)
    params = jax.device_put(params)

    if args.prompt_ids is not None:
        ids = np.asarray([args.prompt_ids], np.int32)
    elif args.prompt is not None and tokenizer is not None:
        ids = np.asarray([tokenizer.encode(args.prompt)], np.int32)
    else:
        raise SystemExit("need --prompt-ids, or --prompt with a tokenizer "
                         "(--hf-model dir containing tokenizer files)")

    # pass every knob through; make_sampling_cfg inside generate() decides
    # whether a PRNG enters the graph (--sample alone = temperature-1
    # multinomial; --repetition-penalty alone = deterministic penalized
    # greedy; any other non-neutral knob implies sampling, the reference's
    # SamplingConfig semantics)
    kwargs = dict(temperature=args.temperature, top_k=args.top_k,
                  top_p=args.top_p,
                  repetition_penalty=args.repetition_penalty,
                  seed=args.seed, do_sample=args.sample)
    out = np.asarray(
        generate(params, cfg, ids, max_new_tokens=args.max_new_tokens,
                 **kwargs))

    row = {"family": fam, "prompt_len": int(ids.shape[1]),
           "output_ids": out[0].tolist()}
    if tokenizer is not None:
        row["text"] = tokenizer.decode(out[0], skip_special_tokens=True)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
