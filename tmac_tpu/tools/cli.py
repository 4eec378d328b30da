"""tmac-tpu command line -- the reference tools/run_pipeline.py analog,
minus the steps a compiled-kernel + external-runtime design needs and a
JAX-native one doesn't (no kernel compilation step, no cmake, no gguf).

  convert     HF checkpoint -> packed tmac-tpu checkpoint
  generate    run generation from a packed checkpoint (llama-cli analog)
  bench-e2e   decode/prefill tokens/s sweep (llama-bench / bench_e2e.py)
  ppl         perplexity over a token file (llama-perplexity analog)
  profile     kernel-level latency CSV (tools/profile.py analog)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_convert(args):
    from tmac_tpu.convert.checkpoint import save_checkpoint
    from tmac_tpu.convert.hf import convert_hf_model
    from tmac_tpu.models.config import QuantConfig

    if args.model_dir.endswith(".gguf"):
        from tmac_tpu.convert.gguf import convert_gguf_model
        cfg, params = convert_gguf_model(args.model_dir, tp=args.tp,
                                         name=args.name)
        save_checkpoint(args.out, cfg, params)
        # gguf artifacts embed their tokenizer; keep it with the packed
        # weights so generate/chat/serve need no --tokenizer (the
        # reference's single-artifact llama.cpp workflow)
        from tmac_tpu.convert.gguf import GGUFReader
        from tmac_tpu.runtime.tokenizer import tokenizer_from_gguf
        r = GGUFReader(args.model_dir)
        tok = tokenizer_from_gguf(r.metadata)
        r.close()
        extra = ""
        if tok is not None:
            tok.save(args.out)
            extra = f", tokenizer ({tok.MODEL}, {tok.vocab_size} tokens)"
        print(f"converted {args.model_dir} -> {args.out} "
              f"(gguf, tp={args.tp}{extra})")
        return

    quant = None
    if args.bits is not None:
        quant = QuantConfig(bits=args.bits, group_size=args.group_size,
                            zero_point=args.zero_point, mode=args.mode)
    elif args.mode == "w_a8":
        quant = QuantConfig(bits=2, group_size=-1, mode="w_a8")
    cfg, params = convert_hf_model(args.model_dir, quant=quant, tp=args.tp,
                                   name=args.name)
    save_checkpoint(args.out, cfg, params)
    n_tok = _copy_hf_tokenizer(args.model_dir, args.out)
    print(f"converted {args.model_dir} -> {args.out} "
          f"({cfg.quant.bits}-bit, mode={cfg.quant.mode}, tp={args.tp}"
          + (f", +{n_tok} tokenizer files" if n_tok else "") + ")")


def _copy_hf_tokenizer(model_dir: str, out_dir: str) -> int:
    """Copy the HF tokenizer artifacts next to the packed weights so the
    converted checkpoint is self-contained (generate/chat/serve load it
    without --tokenizer -- the same single-artifact property the gguf
    path gets from its embedded tokenizer)."""
    import os
    import shutil
    n = 0
    for f in ("tokenizer.json", "tokenizer_config.json", "tokenizer.model",
              "special_tokens_map.json", "vocab.json", "merges.txt",
              "added_tokens.json", "chat_template.jinja"):
        src = os.path.join(model_dir, f)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, f))
            n += 1
    return n


def _load(args):
    from tmac_tpu.convert.checkpoint import load_checkpoint
    return load_checkpoint(args.ckpt)


def _tokenizer_for(args):
    """--tokenizer <HF dir> wins; else the tokenizer saved beside a
    converted gguf checkpoint; else None (raw token-id mode)."""
    if getattr(args, "tokenizer", ""):
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(args.tokenizer)
    if getattr(args, "ckpt", ""):
        from tmac_tpu.runtime.tokenizer import load_tokenizer
        tok = load_tokenizer(args.ckpt)
        if tok is not None:
            return tok
        import os
        if any(os.path.exists(os.path.join(args.ckpt, f))
               for f in ("tokenizer.json", "tokenizer.model", "vocab.json")):
            from transformers import AutoTokenizer
            return AutoTokenizer.from_pretrained(args.ckpt)
    return None


def cmd_generate(args):
    import jax.numpy as jnp
    import numpy as np
    from tmac_tpu.runtime.generate import generate
    from tmac_tpu.runtime.sampling import SamplerConfig

    cfg, params = _load(args)
    if args.prompt_ids:
        ids = [int(t) for t in args.prompt_ids.split(",")]
    else:
        tok = _tokenizer_for(args)
        if tok is None:
            raise SystemExit("no tokenizer: pass --tokenizer, use "
                             "--prompt-ids, or convert from a gguf (whose "
                             "embedded tokenizer is saved automatically)")
        ids = tok.encode(args.prompt)
    sampler = SamplerConfig(temperature=args.temperature, top_k=args.top_k,
                            top_p=args.top_p)
    t0 = time.time()
    if getattr(args, "draft_ckpt", ""):
        from tmac_tpu.convert.checkpoint import load_checkpoint
        from tmac_tpu.runtime.speculative import generate_draft_speculative
        cfg_d, params_d = load_checkpoint(args.draft_ckpt)
        out, nft, nfd = generate_draft_speculative(
            params, cfg, params_d, cfg_d, np.asarray([ids], np.int32),
            max_new_tokens=args.n, k=args.spec_k, sampler=sampler)
        print(f"[draft-speculative: {args.n} tokens in {nft} target + "
              f"{nfd} draft forwards]", file=sys.stderr)
    elif getattr(args, "speculative", False):
        from tmac_tpu.runtime.speculative import generate_speculative
        out, nf = generate_speculative(params, cfg,
                                       np.asarray([ids], np.int32),
                                       max_new_tokens=args.n,
                                       sampler=sampler)
        print(f"[speculative: {args.n} tokens in {nf} forwards]",
              file=sys.stderr)
    else:
        out = generate(params, cfg, np.asarray([ids], np.int32),
                       max_new_tokens=args.n, sampler=sampler)
    out = np.asarray(out)[0]
    dt = time.time() - t0
    print(f"[{args.n} tokens in {dt:.1f}s incl. compile]", file=sys.stderr)
    if args.prompt_ids:
        print(",".join(map(str, out.tolist())))
    else:
        print(tok.decode(out.tolist()))


def cmd_chat(args):
    """Interactive streaming chat on the continuous-batching engine -- the
    reference's `llama-cli` conversational role (tools/run_pipeline.py:
    222-277 runs it with a fixed prompt; `-i` is its interactive mode).
    Each turn resubmits the full conversation, and the engine's
    prompt-prefix KV cache makes that incremental: only the newest turn is
    prefilled, the rest is reused from the previous turn's KV."""
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params
    from tmac_tpu.runtime.engine import InferenceEngine
    from tmac_tpu.runtime.sampling import SamplerConfig

    if args.ckpt:
        cfg, params = _load(args)
    else:
        cfg = get_preset(args.model)
        if args.scale:
            cfg = cfg.scaled(args.scale)
        params = init_params(cfg, seed=0)
    tok = _tokenizer_for(args)
    sampler = SamplerConfig(temperature=args.temperature, top_k=args.top_k,
                            top_p=args.top_p)
    eng = InferenceEngine(cfg, params, max_batch=1, max_len=args.max_len,
                          sampler=sampler, decode_chunk=args.decode_chunk,
                          max_decode_chunk=args.max_decode_chunk,
                          prefix_cache_size=2,
                          prefix_cache_max_len=args.max_len,
                          kv_quant=args.kv_quant)
    printed = {"n": 0}

    def cb(uid, toks_so_far, done):
        if tok is None:
            new = toks_so_far[printed["n"]:]
            if new:
                print(("," if printed["n"] else "") + ",".join(map(str, new)),
                      end="", flush=True)
            printed["n"] = len(toks_so_far)
        else:
            text = tok.decode(toks_so_far, skip_special_tokens=True)
            print(text[printed["n"]:], end="", flush=True)
            printed["n"] = len(text)
        if done:
            print(flush=True)

    eng.stream_cb = cb
    eos = tok.eos_token_id if tok is not None else None
    msgs, ids_hist = [], []
    print("chat ready (empty line or /exit quits; raw token-id mode)"
          if tok is None else
          "chat ready (empty line or /exit quits)", file=sys.stderr)
    while True:
        try:
            user = input("user> ")
        except EOFError:
            break
        if not user.strip() or user.strip() in ("/exit", "/quit"):
            break
        if tok is not None and getattr(tok, "chat_template", None):
            msgs.append({"role": "user", "content": user})
            prompt_ids = tok.apply_chat_template(msgs,
                                                 add_generation_prompt=True)
        elif tok is not None:
            msgs.append({"role": "user", "content": user})
            text = "".join(f"{m['role']}: {m['content']}\n"
                           for m in msgs) + "assistant:"
            prompt_ids = tok.encode(text)
        else:  # raw ids: whitespace/comma-separated ints (tokenizer-free)
            ids_hist += [int(t) for t in user.replace(",", " ").split()]
            prompt_ids = list(ids_hist)
        printed["n"] = 0
        t0 = time.time()
        uid = eng.submit(prompt_ids, max_new_tokens=args.n, eos_id=eos)
        out = eng.run()[uid]
        if tok is not None:
            msgs.append({"role": "assistant",
                         "content": tok.decode(out, skip_special_tokens=True)})
        else:
            ids_hist += [int(t) for t in out]
        print(f"[{len(out)} tokens in {time.time() - t0:.1f}s; prefix "
              f"tokens reused so far: {eng.stats['prefix_tokens_reused']}]",
              file=sys.stderr)


def cmd_bench_e2e(args):
    """Decode + prefill throughput sweep -> CSV on stdout."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import KVCache, init_params
    from tmac_tpu.runtime.generate import decode_loop, prefill
    from tmac_tpu.runtime.sampling import SamplerConfig
    from tmac_tpu.tools.timing import null_roundtrip

    if args.ckpt:
        cfg, params = _load(args)
    else:
        cfg = get_preset(args.model, bits=args.bits)
        if getattr(args, "scale", 0):
            cfg = cfg.scaled(args.scale)
        params = init_params(cfg, seed=0)
    ov = null_roundtrip()
    print("model,batch,prompt_len,steps,decode_tok_s,prefill_tok_s")
    for B in args.batch:
        cache = KVCache.create(cfg, B, args.prompt_len + args.steps)
        rng = np.random.default_rng(0)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, args.prompt_len)))
        key = jax.random.PRNGKey(0)

        # Every rep uses DIFFERENT tokens and is fetched to host: remote
        # tunnels cache identical executions, so repeating the same inputs
        # measures the cache, not the chip (observed: "decode" above
        # speed-of-light and negative prefill times before this fix).
        logits, cache = prefill(params, cfg, toks, cache)  # compile
        _ = float(jnp.sum(logits))
        t_pre = float("inf")
        for r in range(5):
            toks_r = jnp.asarray(
                rng.integers(0, cfg.vocab_size, (B, args.prompt_len)))
            cache2 = KVCache.create(cfg, B, args.prompt_len + args.steps)
            t0 = time.perf_counter()
            lg, cache2 = prefill(params, cfg, toks_r, cache2)
            _ = float(jnp.sum(lg))
            t_pre = min(t_pre, time.perf_counter() - t0 - ov)
        pre_tps = B * args.prompt_len / t_pre

        first = jnp.argmax(logits, -1).astype(jnp.int32)
        out, cache = decode_loop(params, cfg, first, cache, key,
                                 steps=args.steps, sampler=SamplerConfig())
        _ = int(jnp.sum(out))  # compile
        best = float("inf")
        for r in range(3):
            toks_r = jnp.asarray(
                rng.integers(0, cfg.vocab_size, (B, args.prompt_len)))
            cache = KVCache.create(cfg, B, args.prompt_len + args.steps)
            lg, cache = prefill(params, cfg, toks_r, cache)
            first = jnp.argmax(lg, -1).astype(jnp.int32)
            _ = float(jnp.sum(first))
            t0 = time.perf_counter()
            out, cache = decode_loop(params, cfg, first, cache,
                                     jax.random.PRNGKey(r),
                                     steps=args.steps, sampler=SamplerConfig())
            _ = int(jnp.sum(out))
            best = min(best, time.perf_counter() - t0 - ov)
        tps = B * args.steps / best
        name = args.ckpt or args.model
        print(f"{name},{B},{args.prompt_len},{args.steps},{tps:.2f},{pre_tps:.2f}")


def cmd_serve(args):
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params
    from tmac_tpu.runtime.engine import InferenceEngine
    from tmac_tpu.runtime.sampling import SamplerConfig
    from tmac_tpu.runtime.server import serve

    if args.ckpt:
        cfg, params = _load(args)
    else:
        cfg = get_preset(args.model)
        params = init_params(cfg, seed=0)
    tok = _tokenizer_for(args)
    sampler = SamplerConfig(temperature=args.temperature, top_k=args.top_k,
                            top_p=args.top_p)
    eng = InferenceEngine(cfg, params, max_batch=args.max_batch,
                          max_len=args.max_len, sampler=sampler,
                          decode_chunk=args.decode_chunk,
                          max_decode_chunk=args.max_decode_chunk,
                          speculative=args.speculative,
                          prefix_cache_size=args.prefix_cache,
                          kv_quant=args.kv_quant)
    serve(eng, host=args.host, port=args.port, tokenizer=tok,
          model_name=cfg.name)


def cmd_ppl(args):
    import numpy as np
    from tmac_tpu.runtime.perplexity import perplexity

    cfg, params = _load(args)
    if getattr(args, "text", ""):
        # raw-text mode: the reference quality gate feeds llama-perplexity
        # a text corpus (wikitext) and lets the model's own tokenizer cut
        # it (reference tools/run_pipeline.py:218)
        tok = _tokenizer_for(args)
        if tok is None:
            raise SystemExit("--text needs a tokenizer: pass --tokenizer "
                             "or use a gguf-converted checkpoint")
        stream = np.asarray(tok.encode(open(args.text).read()), np.int32)
    elif not args.tokens:
        raise SystemExit("pass --tokens (ids) or --text (raw corpus)")
    else:
        stream = np.load(args.tokens) if args.tokens.endswith(".npy") else \
            np.asarray([int(t) for t in open(args.tokens).read().split()],
                       np.int32)
    r = perplexity(params, cfg, stream, window=args.window)
    print(json.dumps(r))


def cmd_export_gguf(args):
    """Packed checkpoint -> llama.cpp gguf (the llama-quantize role,
    reference tools/run_pipeline.py:164-175): interchange back into the
    llama.cpp ecosystem, with the embedded tokenizer riding along."""
    from tmac_tpu.convert.gguf_export import export_gguf

    cfg, params = _load(args)
    r = export_gguf(args.out, cfg, params, wtype=args.wtype,
                    ckpt_dir=args.ckpt)
    print(f"exported {args.ckpt} -> {r['path']} "
          f"({r['wtype']}, {r['tensors']} tensors, "
          f"{r['bytes'] / 1e6:.1f} MB)")


def cmd_score(args):
    """Teacher-forced continuation log-likelihoods (the lm-eval
    loglikelihood primitive; cf. llama-perplexity's windowed role)."""
    from tmac_tpu.runtime.perplexity import score_continuations

    cfg, params = _load(args)
    ctx = [int(t) for t in args.context_ids.split(",")]
    conts = [[int(t) for t in c.split(",")]
             for c in args.continuation_ids.split(";")]
    out = score_continuations(params, cfg, ctx, conts)
    print(json.dumps(out))


def cmd_parity(args):
    """Model-level output-quality gate: production forward vs the f32
    dequant-oracle per preset x quant mode (the llama-perplexity role,
    reference tools/run_pipeline.py:218, checkpoint-free)."""
    from tmac_tpu.tools import parity

    configs = None
    if args.presets:
        configs = [c for c in parity.GATE_CONFIGS if c[0] in args.presets]
        assert configs, f"no match among {[c[0] for c in parity.GATE_CONFIGS]}"
    rows = parity.run_gate(configs=configs, scale=args.scale, impl=args.impl,
                           seed=args.seed)
    print(parity.format_table(rows))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


def cmd_profile(args):
    from tmac_tpu.tools import profile_kernels
    profile_kernels.main(args.rest)


def cmd_autotune(args):
    from tmac_tpu.tools import autotune
    autotune.main(args.rest)


def cmd_bench_serve(args):
    """Mixed-arrival continuous-batching bench -> JSON on stdout."""
    import numpy as np
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import init_params
    from tmac_tpu.runtime.bench_serve import run_serve_bench
    from tmac_tpu.runtime.engine import InferenceEngine

    if args.ckpt:
        cfg, params = _load(args)
    else:
        cfg = get_preset(args.model, bits=args.bits)
        params = init_params(cfg, seed=0)
    eng = InferenceEngine(cfg, params, max_batch=args.max_batch,
                          max_len=args.max_len,
                          decode_chunk=args.decode_chunk,
                          max_decode_chunk=args.max_decode_chunk,
                          prefix_cache_size=args.prefix_cache,
                          kv_quant=args.kv_quant)
    rng = np.random.default_rng(0)
    # --shared-prefix simulates a common system prompt: with
    # --prefix-cache > 0 the engine skips re-prefilling it per request
    shared = ([int(t) for t in rng.integers(1, cfg.vocab_size,
                                            args.shared_prefix)]
              if args.shared_prefix else [])
    tail = max(args.prompt_len - len(shared), 1)
    prompts = [shared + [int(t) for t in rng.integers(1, cfg.vocab_size,
                                                      tail)]
               for _ in range(args.requests)]
    # warm the compiled programs so arrival timing isn't compile-skewed;
    # warmup() also covers the prefix-cache extract/insert programs and
    # the short remainder-prefill buckets that a prefix HIT routes to --
    # the warm submit alone left those to compile mid-benchmark (the
    # round-4 17 s TTFT regression with --prefix-cache)
    eng.warmup()
    warm = eng.submit(prompts[0], max_new_tokens=2)
    eng.run()
    eng.finished.clear()
    for k in eng.stats:
        eng.stats[k] = 0 if not isinstance(eng.stats[k], float) else 0.0
    r = run_serve_bench(eng, prompts, args.max_new, args.rate)
    r["prefix_hits"] = eng.stats["prefix_hits"]
    r["prefix_tokens_reused"] = eng.stats["prefix_tokens_reused"]
    print(json.dumps(r))


def cmd_trace(args):
    """Capture a jax.profiler device trace of a decode run (view with
    tensorboard or xprof)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tmac_tpu.models.config import get_preset
    from tmac_tpu.models.llama import KVCache, init_params
    from tmac_tpu.runtime.generate import decode_loop, prefill
    from tmac_tpu.runtime.sampling import SamplerConfig

    if args.ckpt:
        cfg, params = _load(args)
    else:
        cfg = get_preset(args.model)
        params = init_params(cfg, seed=0)
    B = args.batch
    cache = KVCache.create(cfg, B, args.prompt_len + args.steps)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (B, args.prompt_len)))
    key = jax.random.PRNGKey(0)
    # compile outside the trace
    logits, cache = prefill(params, cfg, toks, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    out, cache = decode_loop(params, cfg, first, cache, key, steps=args.steps,
                             sampler=SamplerConfig())
    _ = np.asarray(out)
    cache = KVCache.create(cfg, B, args.prompt_len + args.steps)
    logits, cache = prefill(params, cfg, toks, cache)
    first = jnp.argmax(logits, -1).astype(jnp.int32)
    with jax.profiler.trace(args.out):
        out, cache = decode_loop(params, cfg, first, cache, key,
                                 steps=args.steps, sampler=SamplerConfig())
        _ = np.asarray(out)
    print(f"trace written to {args.out} (view: tensorboard --logdir {args.out})")


def main():
    ap = argparse.ArgumentParser(prog="tmac-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert", help="HF checkpoint -> packed checkpoint")
    c.add_argument("--model-dir", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--bits", type=int, default=None)
    c.add_argument("--group-size", type=int, default=128)
    c.add_argument("--zero-point", action="store_true")
    c.add_argument("--mode", default="w_fp", choices=["w_fp", "w_a8"])
    c.add_argument("--tp", type=int, default=1)
    c.add_argument("--name", default="hf-model")
    c.set_defaults(fn=cmd_convert)

    g = sub.add_parser("generate", help="generate tokens from a checkpoint")
    g.add_argument("--ckpt", required=True)
    g.add_argument("--prompt", default="")
    g.add_argument("--prompt-ids", default="")
    g.add_argument("--tokenizer", default="")
    g.add_argument("-n", type=int, default=64)
    g.add_argument("--temperature", type=float, default=0.0)
    g.add_argument("--top-k", type=int, default=0)
    g.add_argument("--top-p", type=float, default=1.0)
    g.add_argument("--speculative", action="store_true",
                   help="lookup speculative decoding (greedy; lossless)")
    g.add_argument("--draft-ckpt", default="",
                   help="packed checkpoint of a small draft model: "
                        "two-model speculative decoding (greedy; lossless)")
    g.add_argument("--spec-k", type=int, default=4,
                   help="draft tokens per verification round")
    g.set_defaults(fn=cmd_generate)

    ch = sub.add_parser("chat", help="interactive streaming chat "
                                     "(llama-cli conversational role)")
    ch.add_argument("--ckpt", default="")
    ch.add_argument("--model", default="bitnet-3b")
    ch.add_argument("--tokenizer", default="",
                    help="HF tokenizer dir (omit for raw token-id mode)")
    ch.add_argument("-n", type=int, default=256)
    ch.add_argument("--max-len", type=int, default=2048)
    ch.add_argument("--decode-chunk", type=int, default=8)
    ch.add_argument("--max-decode-chunk", type=int, default=0,
                    help="adaptive chunk ceiling (amortizes the host "
                         "round-trip on long generations; 0 disables). "
                         "Off by default: chat streams tokens, and growth "
                         "batches stdout output into chunk-sized bursts")
    ch.add_argument("--temperature", type=float, default=0.7)
    ch.add_argument("--top-k", type=int, default=0)
    ch.add_argument("--top-p", type=float, default=1.0)
    ch.add_argument("--scale", type=int, default=0,
                    help="shrink preset by this factor (smoke tests)")
    ch.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache")
    ch.set_defaults(fn=cmd_chat)

    b = sub.add_parser("bench-e2e", help="tokens/s sweep")
    b.add_argument("--ckpt", default="")
    b.add_argument("--model", default="bitnet-3b")
    b.add_argument("--bits", type=int, default=None)
    b.add_argument("--batch", type=int, nargs="+", default=[1])
    b.add_argument("--prompt-len", type=int, default=16)
    b.add_argument("--steps", type=int, default=64)
    b.add_argument("--scale", type=int, default=0,
                   help="shrink the preset by this factor (debug/compile-"
                        "time fallback; 0 = full size)")
    b.set_defaults(fn=cmd_bench_e2e)

    bs = sub.add_parser("bench-serve",
                        help="mixed-arrival serving bench (aggregate tok/s, "
                             "TTFT/latency percentiles)")
    bs.add_argument("--ckpt", default="")
    bs.add_argument("--model", default="bitnet-3b")
    bs.add_argument("--bits", type=int, default=None)
    bs.add_argument("--max-batch", type=int, default=8)
    bs.add_argument("--max-len", type=int, default=1024)
    bs.add_argument("--requests", type=int, default=32)
    bs.add_argument("--rate", type=float, default=4.0,
                    help="mean arrivals per second")
    bs.add_argument("--prompt-len", type=int, default=128)
    bs.add_argument("--max-new", type=int, default=64)
    bs.add_argument("--decode-chunk", type=int, default=8)
    bs.add_argument("--max-decode-chunk", type=int, default=0,
                    help="adaptive chunk ceiling (0 disables; serving "
                         "benches default off so chunk latency is fixed)")
    bs.add_argument("--shared-prefix", type=int, default=0,
                    help="tokens of common system-prompt prefix per request")
    bs.add_argument("--prefix-cache", type=int, default=0,
                    help="engine prompt-prefix KV cache entries (0 = off)")
    bs.add_argument("--kv-quant", action="store_true",
                    help="int8 KV cache")
    bs.set_defaults(fn=cmd_bench_serve)

    s = sub.add_parser("serve", help="HTTP serving (continuous batching)")
    s.add_argument("--ckpt", default="")
    s.add_argument("--model", default="bitnet-3b")
    s.add_argument("--tokenizer", default="")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8777)
    s.add_argument("--max-batch", type=int, default=8)
    s.add_argument("--max-len", type=int, default=2048)
    s.add_argument("--decode-chunk", type=int, default=16)
    s.add_argument("--max-decode-chunk", type=int, default=0,
                    help="adaptive chunk ceiling (amortizes the host "
                         "round-trip on long generations; 0 disables). "
                         "Off by default: the server admits requests "
                         "asynchronously, and a grown chunk delays both "
                         "admission and SSE deltas by up to the ceiling")
    s.add_argument("--temperature", type=float, default=0.0)
    s.add_argument("--top-k", type=int, default=0)
    s.add_argument("--top-p", type=float, default=1.0)
    s.add_argument("--speculative", action="store_true",
                   help="single-stream lookup-speculation latency mode "
                        "(requires --max-batch 1)")
    s.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (half the KV bytes; 2x slots)")
    s.add_argument("--prefix-cache", type=int, default=8,
                   help="prompt-prefix KV cache entries (LRU; 0 disables). "
                        "Repeated system prompts skip re-prefill "
                        "(llama.cpp --prompt-cache role)")
    s.set_defaults(fn=cmd_serve)

    p = sub.add_parser("ppl", help="perplexity over a token or text file")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--tokens", default="", help=".npy or whitespace ids")
    p.add_argument("--text", default="",
                   help="raw text corpus (tokenized with --tokenizer or the "
                        "checkpoint's embedded tokenizer)")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--window", type=int, default=512)
    p.set_defaults(fn=cmd_ppl)

    xg = sub.add_parser("export-gguf",
                        help="packed checkpoint -> llama.cpp gguf "
                             "(llama-quantize role)")
    xg.add_argument("--ckpt", required=True)
    xg.add_argument("--out", required=True, help="output .gguf path")
    xg.add_argument("--wtype", default="auto",
                    help="matmul block type (Q4_0/Q4_1/Q5_0/Q5_1/Q8_0/"
                         "Q4_K/Q5_K/Q6_K/TQ1_0/TQ2_0/I2_S; default auto "
                         "from the checkpoint's quant mode)")
    xg.set_defaults(fn=cmd_export_gguf)

    sc = sub.add_parser("score", help="continuation log-likelihoods "
                                      "(lm-eval loglikelihood primitive)")
    sc.add_argument("--ckpt", required=True)
    sc.add_argument("--context-ids", required=True,
                    help="comma-separated token ids")
    sc.add_argument("--continuation-ids", required=True,
                    help="semicolon-separated comma-lists, one per choice")
    sc.set_defaults(fn=cmd_score)

    pa = sub.add_parser("parity", help="model-level quality gate vs f32 oracle")
    pa.add_argument("--presets", nargs="*", default=None,
                    help="gate config labels (default: all)")
    pa.add_argument("--scale", type=int, default=0,
                    help="shrink factor (0 = full size)")
    pa.add_argument("--impl", default="auto")
    pa.add_argument("--seed", type=int, default=0)
    pa.add_argument("--json", default=None, help="also write rows to file")
    pa.set_defaults(fn=cmd_parity)

    pr = sub.add_parser("profile", help="kernel profiler (pass-through args)")
    pr.add_argument("rest", nargs=argparse.REMAINDER)
    pr.set_defaults(fn=cmd_profile)

    at = sub.add_parser("autotune", help="block-size autotuner (kcfg analog)")
    at.add_argument("rest", nargs=argparse.REMAINDER)
    at.set_defaults(fn=cmd_autotune)

    mb = sub.add_parser("microbench", help="hardware probes (blackbox analog)")
    mb.add_argument("rest", nargs=argparse.REMAINDER)
    mb.set_defaults(fn=lambda a: __import__(
        "tmac_tpu.tools.microbench", fromlist=["main"]).main(a.rest))

    tr = sub.add_parser("trace", help="capture a jax.profiler decode trace")
    tr.add_argument("--ckpt", default="")
    tr.add_argument("--model", default="bitnet-3b")
    tr.add_argument("--out", default="/tmp/tmac-trace")
    tr.add_argument("--batch", type=int, default=1)
    tr.add_argument("--prompt-len", type=int, default=16)
    tr.add_argument("--steps", type=int, default=16)
    tr.set_defaults(fn=cmd_trace)

    # parse_known_args so pass-through flags (profile/autotune) survive
    args, extra = ap.parse_known_args()
    if hasattr(args, "rest"):
        args.rest = list(args.rest) + extra
    elif extra:
        ap.error(f"unrecognized arguments: {' '.join(extra)}")
    args.fn(args)


if __name__ == "__main__":
    main()
