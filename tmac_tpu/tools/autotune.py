"""On-device block-size autotuner -- the autotvm-role tool (reference
ops/base.py:84-127 GridSearchTuner + deploy/compile.py kcfg emission).

For each kernel shape of a model preset, sweeps the legal block_m
candidates on the real device with the chained-timing protocol and records
the winner in tuned/tune_table.json (ops/pallas/tune_table.py), which the
kernel consults at trace time.

    python -m tmac_tpu.tools.cli autotune --preset bitnet-3b --mode w_a8
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from tmac_tpu.ops.pallas import tune_table
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.ops.qgemm import QuantizedTensor
from tmac_tpu.tools.timing import bench_chained, null_roundtrip


def candidates(Mp: int, KP: int, max_bytes: int = 6 << 20,
               limit: int = 4):
    """Legal block_m values: 128-multiples dividing Mp, block <= max_bytes.

    Capped at `limit` evenly-spaced candidates: every candidate is a
    separate Mosaic compile (minutes each for the large-N variants through
    the remote tunnel), so an exhaustive sweep is not worth its cost."""
    out = []
    for d in range(1, Mp // 128 + 1):
        bm = 128 * d
        if Mp % bm == 0 and KP * bm <= max_bytes:
            out.append(bm)
    if len(out) > limit:
        idx = np.linspace(0, len(out) - 1, limit).round().astype(int)
        out = [out[i] for i in sorted(set(idx))]
    return out or [128]


def tune_shape(bits: int, K: int, M: int, N: int, mode: str, gs: int,
               iters: int = 200, overhead: float = None, log=print,
               act: str = "fused") -> dict:
    """Sweep block_m (and, for large-N grouped shapes, the chunk-vs-dequant
    kernel path) on-device; record winners in the tune table.

    act: which activation handling to tune for -- 'fused' matches the
    model's production calls (models/llama.py apply_qlinear).
    """
    rng = np.random.default_rng(0)
    if mode == "w_a8":
        wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
        sc = np.full((1, M), 0.02, np.float32)
        qt = QuantizedTensor.from_quantized(wq, sc, 2 * sc, 2, K)
        if act == "fused":
            x0 = jnp.asarray(rng.standard_normal((N, K)), dtype=jnp.bfloat16)
        else:
            x0 = jnp.asarray(rng.integers(-127, 128, (N, K)), dtype=jnp.int8)
            act = "auto"
        path, bits_eff, gs_eff = "int", 2, qt.group_size
        dispatches = [None]
    else:
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qt = QuantizedTensor.from_float(w, bits, gs, zero_point=True,
                                        scale_dtype=jnp.bfloat16)
        x0 = jnp.asarray(rng.standard_normal((N, K)), dtype=jnp.bfloat16)
        G = qt.scales.shape[0]
        path, bits_eff, gs_eff = "grouped", bits, gs
        # large-N grouped: the kernel-path choice is part of the search
        dispatches = ["chunk", "dequant"] if (N >= 64 and G > 1) else [None]

    def fb(o):
        reps = -(-K // o.shape[1])
        t = jnp.tile(o, (1, reps))[:, :qt.kdim]
        if x0.dtype == jnp.int8:
            return (t.astype(jnp.int32) & 1).astype(jnp.int8)
        return t.astype(x0.dtype)

    KP = qt.packed.shape[0]
    Mp = qt.mdim_padded
    best = {}  # dispatch -> (bm, t)
    for disp in dispatches:
        best_bm, best_t = 0, float("inf")
        for bm in candidates(Mp, KP):
            try:
                t = bench_chained(
                    lambda x, bm=bm, disp=disp: (lambda o: (o, fb(o)))(
                        qgemm_pallas(x, qt, out_dtype=jnp.float32,
                                     block_m=bm, act=act, dispatch=disp)),
                    x0, iters=iters, overhead=overhead)
            except Exception as e:  # noqa: BLE001 -- may not compile
                log(f"  {disp or '-'} bm={bm}: failed ({type(e).__name__})")
                continue
            log(f"  {disp or '-'} bm={bm}: {t*1e6:.1f} us")
            if t < best_t:
                best_bm, best_t = bm, t
        if best_bm:
            best[disp] = (best_bm, best_t)
    assert best, "no candidate compiled"
    win_disp = min(best, key=lambda d: best[d][1])
    best_bm, best_t = best[win_disp]
    # block_m per path variant + the dispatch winner
    for disp, (bm, t) in best.items():
        p = path if disp is None else ("dequant" if disp == "dequant"
                                       else "grouped")
        if not tune_table.record(bits_eff, qt.kdim_padded, Mp, N, gs_eff, p,
                                 bm, t * 1e6):
            log(f"  {disp or '-'} bm={bm}: kept existing faster entry")
    if len(best) > 1:
        mode_key = "fused" if act == "fused" else "float"
        tune_table.record_dispatch(bits_eff, qt.kdim_padded, Mp, N, gs_eff,
                                   mode_key, win_disp, best_t * 1e6)
    return {"bits": bits_eff, "K": K, "M": M, "N": N, "block_m": best_bm,
            "dispatch": win_disp, "us": round(best_t * 1e6, 2)}


# per-model fused decode shapes (K, M) -- matches models/llama.py layers
def model_shapes(cfg):
    H, I = cfg.hidden_size, cfg.intermediate_size
    from tmac_tpu.models.llama import padded_intermediate
    Ip = padded_intermediate(cfg, 1)
    return [(H, cfg.q_dim + 2 * cfg.kv_dim),  # wqkv
            (cfg.q_dim, H),                   # wo
            (H, 2 * Ip),                      # gate_up
            (Ip, H)]                          # down


def main(argv=None):
    from tmac_tpu.models.config import PRESETS, get_preset
    ap = argparse.ArgumentParser(description="qgemm block-size autotuner")
    ap.add_argument("--preset", default="bitnet-3b", choices=list(PRESETS))
    ap.add_argument("--mode", default=None, choices=[None, "w_fp", "w_a8"])
    ap.add_argument("--n", type=int, nargs="+", default=[1])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--bits", type=int, default=None,
                    help="override the preset's weight bits (e.g. tune the "
                         "llama-2-7b W4 variant)")
    args = ap.parse_args(argv)

    cfg = get_preset(args.preset, bits=args.bits)
    mode = args.mode or cfg.quant.mode
    overhead = null_roundtrip()
    print(f"null {overhead*1e3:.1f} ms -> {tune_table.table_path()}",
          file=sys.stderr)
    for N in args.n:
        for K, M in model_shapes(cfg):
            r = tune_shape(cfg.quant.bits, K, M, N, mode,
                           cfg.quant.group_size if cfg.quant.group_size > 0 else 128,
                           iters=args.iters, overhead=overhead,
                           log=lambda *a: print(*a, file=sys.stderr))
            print(r)
    tune_table.invalidate_cache()


if __name__ == "__main__":
    main()
