"""Kernel-level profiler -- the reference tools/profile.py analog.

Sweeps (M, K, N) x bits over the qgemm implementations and writes a CSV of
latency, % of HBM speed-of-light, and speedup over the dequant baselines.
Shape lists mirror reference tools/profile.py:120-157 / model_utils.py
_PRESET_KERNELS (kernel layout here is (K, M): x (N,K) @ W (K,M)).
"""

from __future__ import annotations

import argparse
import csv
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.ops.qgemm import QuantizedTensor, dequant_baseline_matmul
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.tools.timing import bench_chained, null_roundtrip

from tmac_tpu.platform import device_spec

HBM_GBPS = device_spec().hbm_gbps

# (bits, M, K) per model family; N (batch/tokens) swept separately.
SHAPE_PRESETS = {
    "llama-2-7b": [(b, M, K) for b in (2, 4) for (M, K) in
                   [(4096, 4096), (11008, 4096), (4096, 11008)]],
    "llama-2-13b": [(2, 5120, 5120), (2, 13824, 5120), (2, 5120, 13824)],
    "bitnet-3b": [(2, 3200, 8704), (2, 8704, 3200), (2, 3200, 3200)],
    "llama-3-8b": [(2, 4096, 4096), (2, 14336, 4096), (2, 4096, 14336),
                   (2, 1024, 4096)],
}

# bitnet is per-tensor W1.58A8 (its K values don't divide gs=128 anyway)
PRESET_MODE = {"bitnet-3b": "w_a8"}


def profile_shape(bits: int, M: int, K: int, N: int, mode: str = "w_fp",
                  gs: int = 128, iters: int = 100, overhead: float = None):
    rng = np.random.default_rng(0)
    if mode == "w_a8":
        wq = rng.integers(1, 4, (K, M)).astype(np.uint8)
        sc = np.full((1, M), 0.02, np.float32)
        qt = QuantizedTensor.from_quantized(wq, sc, 2 * sc, 2, K)
        x0 = jnp.asarray(rng.integers(-127, 128, (N, K)), dtype=jnp.int8)
    else:
        w = (rng.standard_normal((K, M)) / np.sqrt(K)).astype(np.float32)
        qt = QuantizedTensor.from_float(w, bits, gs, zero_point=True)
        x0 = jnp.asarray(rng.standard_normal((N, K)), dtype=jnp.bfloat16)

    def fb(out, x0):
        # fold (N, M) output back to (N, K)
        if out.shape[1] >= x0.shape[1]:
            return out[:, :x0.shape[1]].astype(x0.dtype)
        reps = -(-x0.shape[1] // out.shape[1])
        return jnp.tile(out, (1, reps))[:, :x0.shape[1]].astype(x0.dtype)

    t_pallas = bench_chained(
        lambda x: (lambda o: (o, fb(o, x0)))(qgemm_pallas(x, qt, out_dtype=jnp.float32)),
        x0, iters=iters, overhead=overhead)

    w8 = jnp.asarray(np.asarray(qt.unpack()))
    sc, sub = qt.scales[:, :qt.mdim], qt.sub[:, :qt.mdim]
    if mode != "w_a8" and qt.kdim % sc.shape[0]:
        # K-padded tensors carry padded scale-group rows; the unpacked
        # logical-K baseline needs only the real groups
        g_real = qt.kdim // gs
        sc, sub = sc[:g_real], sub[:g_real]
    gs_eff = qt.kdim // sc.shape[0]
    xb = x0.astype(jnp.bfloat16) if mode == "w_a8" else x0
    t_base = bench_chained(
        lambda x: (lambda o: (o, fb(o, xb)))(
            dequant_baseline_matmul(x, w8, sc, sub, gs_eff)),
        xb, iters=max(iters // 4, 10), overhead=overhead)

    wbytes = qt.packed.size + (qt.packed_hi.size if qt.packed_hi is not None else 0)
    sol = wbytes / (HBM_GBPS * 1e9)
    return {
        "bits": bits, "M": M, "K": K, "N": N, "mode": mode,
        "pallas_us": round(t_pallas * 1e6, 2),
        "dequant_baseline_us": round(t_base * 1e6, 2),
        "speedup_vs_baseline": round(t_base / t_pallas, 2),
        "sol_us": round(sol * 1e6, 2),
        "pct_sol": round(100 * sol / t_pallas, 1),
        "weight_GBps": round(wbytes / t_pallas / 1e9, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="qgemm kernel profiler")
    ap.add_argument("--preset", default="llama-2-7b", choices=list(SHAPE_PRESETS) + ["all"])
    ap.add_argument("--n", type=int, nargs="+", default=[1],
                    help="N values (1=decode, 256=prefill)")
    ap.add_argument("--mode", default="w_fp", choices=["w_fp", "w_a8"])
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--out", default="profile_results.csv")
    args = ap.parse_args(argv)

    presets = list(SHAPE_PRESETS) if args.preset == "all" else [args.preset]
    overhead = null_roundtrip()
    print(f"null round-trip {overhead*1e3:.1f} ms; device {jax.devices()[0]}",
          file=sys.stderr)

    rows = []
    writer = None
    f = open(args.out, "w", newline="")
    for p in presets:
        mode = PRESET_MODE.get(p, args.mode)
        for bits, M, K in SHAPE_PRESETS[p]:
            for N in args.n:
                try:
                    r = profile_shape(bits, M, K, N, mode=mode,
                                      iters=args.iters, overhead=overhead)
                except Exception as e:  # noqa: BLE001 -- keep sweeping
                    print(f"shape ({bits},{M},{K}) N={N} failed: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    continue
                r["preset"] = p
                rows.append(r)
                print(r, file=sys.stderr)
                # write-through: a crash or timeout must not lose the sweep
                if writer is None:
                    writer = csv.DictWriter(f, fieldnames=list(r.keys()))
                    writer.writeheader()
                writer.writerow(r)
                f.flush()
    f.close()
    print(f"wrote {args.out} ({len(rows)} rows)", file=sys.stderr)


if __name__ == "__main__":
    main()
