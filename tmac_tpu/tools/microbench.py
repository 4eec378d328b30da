"""Hardware probes -- the reference blackbox/test_tbl.cc analog.

The reference measures raw `vqtbl1q_u8` vs add/xor/fma throughput on-device
to justify the LUT design (README.md:75-88).  The TPU equivalents probed
here justify THIS framework's central choice (ops/pallas docstrings):

  * hbm_copy       achievable HBM read bandwidth at several block sizes
  * mxu_int8/bf16  MXU matmul throughput (the compute the unpack feeds)
  * vpu_shift      SWAR shift+mask field-extract throughput (the unpack)
  * gather         jnp.take_along_axis 16-entry lookup (the literal-LUT
                   road NOT taken -- orders of magnitude below the MXU)

Run: python -m tmac_tpu.tools.cli microbench   (or this module directly)
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tmac_tpu.tools.timing import bench_chained, null_roundtrip


def probe_hbm_copy(overhead, sizes_mb=(1, 8, 64)):
    rows = []
    for mb in sizes_mb:
        n = mb * (1 << 20)
        x0 = jnp.zeros((n // 128, 128), jnp.int8)

        def step(x):
            y = x + jnp.int8(1)   # read + write the full buffer
            return y, y
        t = bench_chained(step, x0, iters=50, overhead=overhead)
        rows.append({"probe": f"hbm_rw_{mb}MB",
                     "GBps": round(2 * n / t / 1e9, 1),
                     "us": round(t * 1e6, 2)})
    return rows


def probe_mxu(overhead, n=2048):
    rows = []
    for dtype, acc in ((jnp.int8, jnp.int32), (jnp.bfloat16, jnp.float32)):
        a0 = jnp.ones((n, n), dtype)
        b = jnp.ones((n, n), dtype)

        def step(a):
            c = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            return c, c.astype(dtype)
        t = bench_chained(step, a0, iters=30, overhead=overhead)
        rows.append({"probe": f"mxu_{np.dtype(dtype).name}_{n}",
                     "TOPS": round(2 * n ** 3 / t / 1e12, 1),
                     "us": round(t * 1e6, 2)})
    return rows


def probe_vpu_shift(overhead, mb=16):
    n = mb * (1 << 20) // 4
    x0 = jnp.ones((n // 128, 128), jnp.int32)

    def step(x):
        # the SWAR unpack inner op: shift + mask, 4 fields
        acc = x & 0x03030303
        for j in (1, 2, 3):
            acc = acc + ((x >> (2 * j)) & 0x03030303)
        return acc, acc
    t = bench_chained(step, x0, iters=50, overhead=overhead)
    ops = 7 * x0.size  # 3 shifts + 4 ands (+ adds folded)
    return [{"probe": f"vpu_shiftmask_{mb}MB",
             "Gops": round(ops / t / 1e9, 1),
             "weights_per_s_G": round(16 * x0.size / t / 1e9, 1),
             "us": round(t * 1e6, 2)}]


def probe_gather(overhead, K=2048, M=1024):
    """The literal T-MAC gather: lut[k, idx(k, m)] via take_along_axis."""
    rng = np.random.default_rng(0)
    lut = jnp.asarray(rng.integers(-127, 127, (K // 4, 16)), jnp.int8)
    idx0 = jnp.asarray(rng.integers(0, 16, (K // 4, M)), jnp.int32)

    def step(idx):
        vals = jnp.take_along_axis(lut[:, None, :].repeat(M, 1),
                                   idx[..., None], axis=-1)[..., 0]
        s = jnp.sum(vals.astype(jnp.int32), axis=0)  # (M,)
        nxt = (idx + s[None, :].astype(jnp.int32)) & 15
        return s, nxt
    t = bench_chained(step, idx0, iters=20, overhead=overhead)
    return [{"probe": f"lut_gather_{K}x{M}",
             "lookups_per_s_G": round(idx0.size / t / 1e9, 2),
             "us": round(t * 1e6, 2)}]


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU hardware probes")
    ap.add_argument("--probes", nargs="+",
                    default=["hbm", "mxu", "vpu", "gather"])
    args = ap.parse_args(argv)
    ov = null_roundtrip()
    print(f"device {jax.devices()[0].device_kind}, null {ov*1e3:.1f} ms",
          file=sys.stderr)
    rows = []
    if "hbm" in args.probes:
        rows += probe_hbm_copy(ov)
    if "mxu" in args.probes:
        rows += probe_mxu(ov)
    if "vpu" in args.probes:
        rows += probe_vpu_shift(ov)
    if "gather" in args.probes:
        rows += probe_gather(ov)
    for r in rows:
        print(r)
    return rows


if __name__ == "__main__":
    main()
