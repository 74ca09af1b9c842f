"""Temporal-attention implementations, timed as 32 chained applications in
one jitted scan (the denoise-loop count) at the full DiT shape
[3, 32, 512, 16, 32]. Chaining (output feeds the next q) defeats DCE/CSE;
the scalar-fetch sync is the only trustworthy barrier on this backend."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax
import jax.numpy as jnp

from microbench import timeit

from gvfdiffusion_tpu.ops import fused_attention as fa

B, T, N, H, D = 3, 32, 512, 16, 32
SCALE = D ** -0.5
STEPS = 8


def einsum_attn(q, k, v):
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bnhts,bsnhd->btnhd", w, v)


def kernel_attn(q, k, v):
    return fa.temporal_attention(q, k, v, SCALE)


def chained(attn):
    @jax.jit
    def run(q, k, v):
        def step(q, _):
            o = attn(q, k, v)
            return o + 1e-6 * q, None

        q, _ = jax.lax.scan(step, q, None, length=STEPS)
        return q

    return run


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, N, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, T, N, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, T, N, H, D), jnp.bfloat16)
    for name, attn in [("einsum", einsum_attn), ("kernel", kernel_attn)]:
        fn = chained(attn)
        dt = timeit(lambda: fn(q, k, v), iters=5)
        print(f"{name:8s} {dt*1e3:8.1f} ms / {STEPS} -> {dt/STEPS*1e3:6.2f} ms per call")


if __name__ == "__main__":
    main()
