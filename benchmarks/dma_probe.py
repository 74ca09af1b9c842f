"""HBM bandwidth + Pallas pipeline-overhead probes.

  xla-copy    — y = x + 1 over 256 MB (reads+writes 512 MB): HBM ceiling
  pallas-copy — same, trivial kernel, grid over row blocks
  ai-bb       — attention-shaped matmul-pair cells with batch_block in
                {1,2,4,8}: if time falls with fewer/fatter cells the
                limiter is per-cell latency, if flat it's bandwidth

Run: python benchmarks/dma_probe.py
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import timeit


def xla_copy():
    x = jnp.ones((128 * 1024, 1024), jnp.bfloat16)  # 256 MB

    @jax.jit
    def fn(x):
        def body(c, _):
            return c + 1.0, None
        return jax.lax.scan(body, x, None, length=8)[0]

    t = timeit(lambda: fn(x), iters=5) / 8
    gb = 2 * x.size * 2 / 1e9
    print(f"xla-copy 256MB: {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s")


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def pallas_copy(rows):
    x = jnp.ones((128 * 1024, 1024), jnp.bfloat16)
    n = x.shape[0] // rows

    def call(x):
        return pl.pallas_call(
            _copy_kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    @jax.jit
    def fn(x):
        def body(c, _):
            return call(c), None
        return jax.lax.scan(body, x, None, length=8)[0]

    t = timeit(lambda: fn(x), iters=5) / 8
    gb = 2 * x.size * 2 / 1e9
    print(f"pallas-copy rows={rows} ({n} cells, "
          f"{rows*1024*2//1024} KB/blk): {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s")


def _ai_kernel(q_ref, k_ref, v_ref, o_ref):
    bb = q_ref.shape[0]
    for b in range(bb):
        q = q_ref[b].astype(jnp.bfloat16)
        k = k_ref[b].astype(jnp.bfloat16)
        v = v_ref[b].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = s.astype(jnp.bfloat16)
        o_ref[b] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def ai_bb(lq, lk, bb, name):
    B, C = 96, 512
    lkp = ((lk + 127) // 128) * 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, lq, C), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, lkp, C), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, lkp, C), jnp.bfloat16)

    def call(q, k, v):
        return pl.pallas_call(
            _ai_kernel,
            grid=(B // bb,),
            in_specs=[
                pl.BlockSpec((bb, lq, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, lkp, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, lkp, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, lq, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, lq, C), q.dtype),
        )(q, k, v)

    @jax.jit
    def fn(q, k, v):
        def body(x, _):
            return call(x, k, v), None
        return jax.lax.scan(body, q, None, length=8)[0]

    t = timeit(lambda: fn(q, k, v), iters=3) / 8
    macs = B * (lq * C * lkp + lq * lkp * C)
    gb = (q.size + k.size + v.size + q.size) * 2 / 1e9
    print(f"ai-bb {name} bb={bb}: {t*1e3:7.2f} ms  "
          f"computed {2*macs/t/1e12:6.1f} TF/s  DMA {gb/t:6.1f} GB/s")


def main():
    xla_copy()
    pallas_copy(1024)
    for bb in (1, 2, 4):
        ai_bb(512, 512, bb, "spatial")
    for bb in (1, 2):
        ai_bb(512, 1370, bb, "img_cross")


if __name__ == "__main__":
    main()
