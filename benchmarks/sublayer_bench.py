"""Fused-sublayer kernel vs the composed XLA path at DiT denoise shapes.

Run: python benchmarks/sublayer_bench.py
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

from gvfdiffusion_tpu.ops import fused_sublayer as fs

R = 16


def main():
    C, H = 512, 16
    for B, L, name in [(32, 512, "spatial B=32 (1-CFG)"),
                       (96, 512, "spatial B=96 (3-CFG)")]:
        ks = jax.random.split(jax.random.PRNGKey(0), 10)
        x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
        sh = jax.random.normal(ks[1], (B, C), jnp.bfloat16) * 0.1
        sc = jax.random.normal(ks[2], (B, C), jnp.bfloat16) * 0.1
        g = jax.random.normal(ks[3], (B, C), jnp.bfloat16) * 0.1
        wqkv = jax.random.normal(ks[4], (C, 3 * C), jnp.bfloat16) * 0.02
        bqkv = jnp.zeros((3 * C,), jnp.bfloat16)
        qg = jnp.ones((C,), jnp.bfloat16) * (32 ** 0.5)
        kg = jnp.ones((C,), jnp.bfloat16) * (32 ** 0.5)
        wo = jax.random.normal(ks[5], (C, C), jnp.bfloat16) * 0.02
        bo = jnp.zeros((C,), jnp.bfloat16)
        args = (x, sh, sc, g, wqkv, bqkv, qg, kg, wo, bo)

        def bench(call, label):
            @jax.jit
            def fn(x, *rest):
                def body(c, _):
                    return call(c, *rest), None
                return jax.lax.scan(body, x, None, length=R)[0]

            try:
                t = timeit(lambda: fn(*args), iters=3) / R
                print(f"{name:24s} {label:10s} {t*1e3:7.2f} ms")
                return fn(*args)
            except Exception as e:
                print(f"{name:24s} {label:10s} FAILED: {str(e)[:150]}")
                return None

        a = bench(lambda *a: fs.self_sublayer_reference(*a, num_heads=H,
                                                        rms=True), "xla")
        b = bench(lambda *a: fs.fused_self_sublayer(*a, num_heads=H,
                                                    rms=True), "fused")
        if a is not None and b is not None:
            err = jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b.astype(jnp.float32)))
            ref = jnp.max(jnp.abs(a.astype(jnp.float32)))
            print(f"{name:24s} max|d|={float(err):.4g} "
                  f"(max|ref|={float(ref):.4g})")


if __name__ == "__main__":
    main()
