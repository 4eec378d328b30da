"""Render round-4 runbook artifacts to markdown tables for BENCH.md.

Reads (whatever exists):
  parity_r04.json / parity_rows/*.json   -- full-size quality gate
  /tmp/r4_bench.log, /tmp/r4_bench_defkv.log
  /tmp/r4_breakdown.log
  /tmp/r4_matrix.log                     -- len-256 prefill matrix CSV
  /tmp/r4_serve*.log                     -- bench-serve percentile JSON
  /tmp/r4_spec*.log
  /tmp/r4_moe_*.log
  /tmp/r4_longctx.log
  /tmp/r4_gguf_rt.log / gguf_roundtrip_r04.json
  tuned/tune_table.json                  -- N-coverage summary

BENCH.md is then edited from THIS output, not from memory
(round-3 VERDICT item 10).
"""
import glob
import json
import os
import re


def sec(title):
    print(f"\n### {title}\n")


def parity_table():
    rows = []
    if os.path.exists("parity_r04.json"):
        rows = json.load(open("parity_r04.json"))
    else:
        for f in sorted(glob.glob("parity_rows/*.json")):
            rows.extend(json.load(open(f)))
    if not rows:
        return
    sec("Full-size parity table (parity_r04.json)")
    print("| preset | quant | e2e nmse (med) | layer nmse (max) | "
          "tie-aware agree | dppl | s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        lm = r.get("layer_nmse_max")
        lm = f"{lm:.1e}" if lm is not None else "--"
        print(f"| {r['preset']} | {r['quant']} | {r['nmse']:.2e} | {lm} | "
              f"{r['agree_tie_aware']:.3f} | {r['ppl_rel_delta']:.1e} | "
              f"{r['gate_seconds']:.0f} |")


def grep_json_lines(path):
    out = []
    if not os.path.exists(path):
        return out
    for line in open(path, errors="replace"):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def text(path):
    return open(path, errors="replace").read() if os.path.exists(path) else ""


def bench():
    for tag, path in (("headline", "/tmp/r4_bench.log"),
                      ("deferred-KV", "/tmp/r4_bench_defkv.log")):
        js = grep_json_lines(path)
        if js:
            sec(f"bench.py ({tag})")
            for j in js:
                print(j)


def raw_sections():
    for title, path in (
            ("decode breakdown", "/tmp/r4_breakdown.log"),
            ("len-256 prefill matrix", "/tmp/r4_matrix.log"),
            ("bench-serve baseline", "/tmp/r4_serve.log"),
            ("bench-serve int8-KV", "/tmp/r4_serve_int8kv.log"),
            ("bench-serve no prefix cache", "/tmp/r4_serve_nocache.log"),
            ("bench-serve prefix cache", "/tmp/r4_serve_cache.log"),
            ("speculative (lookup)", "/tmp/r4_spec.log"),
            ("speculative (draft)", "/tmp/r4_spec_draft.log"),
            ("MoE dense-masked", "/tmp/r4_moe_dense.log"),
            ("MoE expert-select", "/tmp/r4_moe_sel.log"),
            ("long-context / int8-KV / adaptive-chunk", "/tmp/r4_longctx.log"),
            ("gguf round trip", "/tmp/r4_gguf_rt.log")):
        t = text(path)
        if not t:
            continue
        sec(title)
        # keep data lines: csv rows, json, and "x: y" measurements
        for line in t.splitlines():
            ls = line.strip()
            if not ls or ls.startswith(("WARNING", "warnings.", "  ")):
                continue
            if (re.match(r"^[\w .():=%/-]+:\s*[\d{-]", ls)
                    or ls.startswith("{") or ("," in ls and
                                              re.search(r"\d", ls))):
                print(ls)


def tune_coverage():
    p = "tuned/tune_table.json"
    if not os.path.exists(p):
        return
    t = json.load(open(p))
    sec("tune table N coverage")
    for dev, entries in t.items():
        ns = {}
        for k in entries:
            m = re.search(r"n(\d+)_", k) or re.search(r"_n(\d+)", k)
            if m:
                ns[int(m.group(1))] = ns.get(int(m.group(1)), 0) + 1
        print(dev, dict(sorted(ns.items())), f"total={len(entries)}")


if __name__ == "__main__":
    parity_table()
    bench()
    raw_sections()
    tune_coverage()
