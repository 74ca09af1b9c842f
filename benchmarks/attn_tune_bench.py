"""Sweep the fused-attention kernel's tuning knobs at the DiT hot shapes:
head-block (lanes per grid cell), Lq block, and the temporal kernel's NC
voxel packing. 20-rep scans per timing (single calls sit under the ~25-30 ms
axon dispatch floor).

Run: python benchmarks/attn_tune_bench.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp

from microbench import timeit

from gvfdiffusion_tpu.ops import fused_attention as fa

REPS = 20


def time_fused(lq, lk, hb, lq_blk, B=96, H=16, D=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, lq, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, lk, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, lk, H, D), jnp.bfloat16)
    fa._FORCE_HEAD_BLK = hb
    fa._FORCE_LQ_BLK = lq_blk
    try:
        @jax.jit
        def fn(q, k, v):
            def body(x, _):
                return fa.fused_attention(x, k, v, D**-0.5), None
            return jax.lax.scan(body, q, None, length=REPS)[0]

        t = timeit(lambda: fn(q, k, v), iters=5) / REPS
    finally:
        fa._FORCE_HEAD_BLK = None
        fa._FORCE_LQ_BLK = None
    flops = 4 * B * H * lq * lk * D
    return t, flops / t / 1e12


def time_temporal(nc, B=3, T=32, N=512, H=16, D=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, N, H, D), jnp.bfloat16)
    old = fa._TEMPORAL_NC
    fa._TEMPORAL_NC = nc
    try:
        @jax.jit
        def fn(q, k, v):
            def body(x, _):
                return fa.temporal_attention(x, k, v, D**-0.5), None
            return jax.lax.scan(body, q, None, length=REPS)[0]

        t = timeit(lambda: fn(q, k, v), iters=5) / REPS
    finally:
        fa._TEMPORAL_NC = old
    return t


def main():
    print("== fused kernel (B=96 H=16 D=32) ==")
    for name, lq, lk in [("spatial", 512, 512), ("img_cross", 512, 1370)]:
        for hb in (4, 8):
            for lq_blk in (256, 512):
                t, tf = time_fused(lq, lk, hb, lq_blk)
                print(f"{name:10s} hb={hb} lq_blk={lq_blk}: "
                      f"{t*1e3:6.2f} ms  {tf:6.1f} TF/s", flush=True)
    print("== temporal kernel (B=3 T=32 N=512 H=16 D=32) ==")
    for nc in (4, 8, 16):
        t = time_temporal(nc)
        print(f"temporal NC={nc}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
