"""pl.Buffered(buffer_count=N) sweep: can deeper pipeline buffering push the
Pallas copy/attention streaming rate from ~100 GB/s toward the ~270 GB/s the
XLA matmul emitter sustains on this platform?

Run: python benchmarks/buffered_probe.py
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


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def pallas_copy(rows, bufs):
    x = jnp.ones((131072, 1024), jnp.bfloat16)  # 256 MB
    n = x.shape[0] // rows
    mode = pl.Buffered(buffer_count=bufs) if bufs else None

    def call(x):
        return pl.pallas_call(
            _copy_kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=mode)],
            out_specs=pl.BlockSpec((rows, 1024), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=mode),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    @jax.jit
    def fn(x):
        def body(c, _):
            return call(c), None
        return jax.lax.scan(body, x, None, length=8)[0]

    t = timeit(lambda: fn(x), iters=3) / 8
    gb = 2 * x.size * 2 / 1e9
    print(f"copy rows={rows} bufs={bufs}: {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s")


def _ai_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s.astype(jnp.bfloat16)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def ai(lq, lk, bufs, name):
    B, C = 96, 512
    lkp = ((lk + 127) // 128) * 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, lq, C), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, lkp, C), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, lkp, C), jnp.bfloat16)
    mode = pl.Buffered(buffer_count=bufs) if bufs else None

    def call(q, k, v):
        return pl.pallas_call(
            _ai_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, lq, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=mode),
                pl.BlockSpec((1, lkp, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=mode),
                pl.BlockSpec((1, lkp, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=mode),
            ],
            out_specs=pl.BlockSpec((1, lq, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM,
                                   pipeline_mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, lq, C), q.dtype),
        )(q, k, v)

    @jax.jit
    def fn(q, k, v):
        def body(x, _):
            return call(x, k, v), None
        return jax.lax.scan(body, q, None, length=8)[0]

    t = timeit(lambda: fn(q, k, v), iters=3) / 8
    gb = (2 * q.size + 2 * k.size) * 2 / 1e9
    print(f"ai {name} bufs={bufs}: {t*1e3:7.2f} ms  DMA {gb/t:6.1f} GB/s")


def main():
    for rows, bufs in [(512, 0), (512, 4), (512, 8), (256, 8), (1024, 4),
                       (128, 8), (128, 16)]:
        try:
            pallas_copy(rows, bufs)
        except Exception as e:
            print(f"copy rows={rows} bufs={bufs} FAILED: {str(e)[:100]}")
    for bufs in (0, 3, 4):
        try:
            ai(512, 512, bufs, "spatial")
        except Exception as e:
            print(f"ai bufs={bufs} FAILED: {str(e)[:100]}")
    for bufs in (0, 3):
        try:
            ai(512, 1370, bufs, "img_cross")
        except Exception as e:
            print(f"ai bufs={bufs} FAILED: {str(e)[:100]}")


if __name__ == "__main__":
    main()
