"""TPU drive: fused residual-block kernel — compile time, correctness vs
the separate kernels, per-layer timing, then the full bench."""
import os
import sys
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from tmac_tpu.models.config import get_preset
from tmac_tpu.models.llama import init_params
from tmac_tpu.ops.pallas.block_kernel import wo_mlp_block
from tmac_tpu.ops.pallas.qgemm_kernel import qgemm_pallas
from tmac_tpu.tools.timing import bench_chained, null_roundtrip
from tmac_tpu.utils import nmse

cfg = get_preset("bitnet-3b")
params = init_params(cfg, seed=0)
layer = params["layers"][0]
H = cfg.hidden_size
rng = np.random.default_rng(0)
attn = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)
resid = jnp.asarray(rng.standard_normal((1, H)), jnp.float32)
eps = cfg.rms_norm_eps

t0 = time.time()
got = np.asarray(wo_mlp_block(attn, resid, layer["mlp_norm"],
                              layer["wo"], layer["gate_up"], layer["down"],
                              eps))
print(f"block kernel compile+run: {time.time()-t0:.1f}s", flush=True)

# reference: separate production kernels
ab = attn.astype(jnp.bfloat16)
x2 = qgemm_pallas(ab, layer["wo"], act="fused", out_dtype=jnp.float32,
                  residual=resid)
guo = qgemm_pallas(x2.astype(jnp.bfloat16), layer["gate_up"], act="fused",
                   out_dtype=jnp.float32,
                   norm=(layer["mlp_norm"], eps))
ref = np.asarray(qgemm_pallas(guo.astype(jnp.bfloat16), layer["down"],
                              act="fused", out_dtype=jnp.float32, glu=True,
                              residual=x2))
e = nmse(ref, got)
print(f"block vs separate kernels nmse: {e:.2e}", flush=True)
assert e < 2e-3, e

ov = null_roundtrip()


def t_block(x):
    o = wo_mlp_block(x, resid, layer["mlp_norm"], layer["wo"],
                     layer["gate_up"], layer["down"], eps)
    return o, o


def t_separate(x):
    xb = x.astype(jnp.bfloat16)
    x2 = qgemm_pallas(xb, layer["wo"], act="fused", out_dtype=jnp.float32,
                      residual=resid)
    guo = qgemm_pallas(x2.astype(jnp.bfloat16), layer["gate_up"],
                       act="fused", out_dtype=jnp.float32,
                       norm=(layer["mlp_norm"], eps))
    d = qgemm_pallas(guo.astype(jnp.bfloat16), layer["down"], act="fused",
                     out_dtype=jnp.float32, glu=True, residual=x2)
    return d, d


tb = bench_chained(t_block, attn, iters=100, reps=3, overhead=ov)
ts = bench_chained(t_separate, attn, iters=100, reps=3, overhead=ov)
print(f"block: {tb*1e6:.1f} us  separate: {ts*1e6:.1f} us  "
      f"saving x26 = {(ts-tb)*26*1e3:.3f} ms/token", flush=True)
