"""Raw-rate probes: what does this v5e chip actually sustain?

  big-mm      — one [8192,8192]x[8192,8192] bf16 XLA matmul (MXU peak check)
  xla-attn    — plain XLA batched einsum attention at the DiT shape
  pallas-ai   — dense-probe cell repeated R matmul pairs on resident data
                (arithmetic intensity sweep: if TF/s rises with R, the
                shipped kernel is DMA/overhead-bound, not MXU-bound)
  pallas-hb16 — dense probe with full-lane contiguous [1, L, 512] blocks

Run: python benchmarks/mxu_probe.py
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


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def big_mm():
    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    @jax.jit
    def fn(a, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=jnp.bfloat16), None
        return jax.lax.scan(body, a, None, length=8)[0]

    t = timeit(lambda: fn(a, b), iters=5) / 8
    print(f"big-mm 8192^3 bf16: {t*1e3:7.2f} ms  {2*n**3/t/1e12:6.1f} TF/s")


def xla_attn(lq, lk, name):
    B, H, D = 96, 16, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, lq, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, lk, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, lk, H, D), jnp.bfloat16)

    @jax.jit
    def fn(q, k, v):
        def body(x, _):
            s = jnp.einsum("bqhd,bkhd->bhqk", x, k,
                           preferred_element_type=jnp.float32) * D**-0.5
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
            return o, None
        return jax.lax.scan(body, q, None, length=4)[0]

    t = timeit(lambda: fn(q, k, v), iters=3) / 4
    flops = 4 * B * H * lq * lk * D
    print(f"xla-attn {name}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")


def _ai_kernel(q_ref, k_ref, v_ref, o_ref, *, reps):
    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    o = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    for r in range(reps):
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = (s + float(r)).astype(jnp.bfloat16)
        o = o + jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def pallas_ai(lq, lk, lanes, reps, name):
    B = 96
    H, D = 16, 32
    lkp = _round_up(lk, 128)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, lq, H * D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, lkp, H * D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, lkp, H * D), jnp.bfloat16)
    ng = (H * D) // lanes
    kernel = functools.partial(_ai_kernel, reps=reps)

    def call(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(B, ng),
            in_specs=[
                pl.BlockSpec((1, lq, lanes), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, lq, lanes), lambda b, g: (b, 0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, lq, H * D), q.dtype),
        )(q, k, v)

    @jax.jit
    def fn(q, k, v):
        def body(x, _):
            return call(x, k, v), None
        return jax.lax.scan(body, q, None, length=8)[0]

    t = timeit(lambda: fn(q, k, v), iters=3) / 8
    macs = B * ng * reps * (lq * lanes * lkp + lq * lkp * lanes)
    print(f"pallas {name} lanes={lanes} reps={reps}: {t*1e3:7.2f} ms  "
          f"computed {2*macs/t/1e12:6.1f} TF/s")


def main():
    big_mm()
    xla_attn(512, 512, "spatial")
    xla_attn(512, 1370, "img_cross")
    for lanes in (256, 512):
        for reps in (1, 4):
            pallas_ai(512, 512, lanes, reps, "spatial")
    pallas_ai(512, 1370, 256, 1, "img_cross")
    pallas_ai(512, 1370, 256, 4, "img_cross")


if __name__ == "__main__":
    main()
