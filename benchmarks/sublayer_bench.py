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


def bench_one(name, label, call, args, check=None):
    @jax.jit
    def fn(x, *rest):
        def body(c, _):
            return call(c, *rest), None
        return jax.lax.scan(body, x, None, length=R)[0]

    try:
        t = timeit(lambda: fn(*args), iters=3) / R
        print(f"{name:24s} {label:10s} {t*1e3:7.2f} ms")
        out = fn(*args)
    except Exception as e:
        print(f"{name:24s} {label:10s} FAILED: {str(e)[:140]}")
        return
    if check is not None:
        err = jnp.max(jnp.abs(out.astype(jnp.float32) -
                              check.astype(jnp.float32)))
        print(f"{name:24s} max|d|={float(err):.4g}")


def temporal_and_more():
    C, H = 512, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 12)
    # temporal at B=1 (single-CFG denoise) and B=3
    for B in (1, 3):
        T, N = 32, 512
        x = jax.random.normal(ks[0], (B, T, N, C), jnp.bfloat16)
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
        name = f"temporal B={B}"
        bench_one(name, "xla", lambda *a: fs.temporal_sublayer_reference(
            *a, num_heads=H, rms=True), args)
        bench_one(name, "fused", lambda *a: fs.fused_temporal_sublayer(
            *a, num_heads=H, rms=True), args)

    # dual-cross at BT in (32, 96)
    for BT in (32, 96):
        L = 512
        x = jax.random.normal(ks[0], (BT, L, C), jnp.bfloat16)

        def pg(i):
            kk = jax.random.split(ks[i], 7)
            return (
                jnp.ones((C,), jnp.bfloat16),
                jnp.zeros((C,), jnp.bfloat16),
                jax.random.normal(kk[2], (C, C), jnp.bfloat16) * 0.02,
                jnp.zeros((C,), jnp.bfloat16),
                jnp.ones((C,), jnp.bfloat16),
                jax.random.normal(kk[5], (C, C), jnp.bfloat16) * 0.02,
                jnp.zeros((C,), jnp.bfloat16),
            )

        p1, p2 = pg(6), pg(7)
        kv1 = (jax.random.normal(ks[8], (BT, 1370, C), jnp.bfloat16),
               jax.random.normal(ks[9], (BT, 1370, C), jnp.bfloat16))
        kv2 = (jax.random.normal(ks[10], (BT, 512, C), jnp.bfloat16),
               jax.random.normal(ks[11], (BT, 512, C), jnp.bfloat16))
        name = f"dual-cross BT={BT}"
        bench_one(name, "xla", lambda x: fs.cross_sublayer_reference(
            x, p1, kv1, p2, kv2, num_heads=H, rms=False), (x,))
        bench_one(name, "fused", lambda x: fs.fused_cross_sublayer(
            x, p1, kv1, p2, kv2, num_heads=H, rms=False), (x,))

    # mlp at BT in (32, 96)
    for BT in (32, 96):
        L = 512
        x = jax.random.normal(ks[0], (BT, L, C), jnp.bfloat16)
        sh = jax.random.normal(ks[1], (BT, C), jnp.bfloat16) * 0.1
        sc = jax.random.normal(ks[2], (BT, C), jnp.bfloat16) * 0.1
        g = jax.random.normal(ks[3], (BT, C), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(ks[4], (C, 4 * C), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((4 * C,), jnp.bfloat16)
        w2 = jax.random.normal(ks[5], (4 * C, C), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((C,), jnp.bfloat16)
        args = (x, sh, sc, g, w1, b1, w2, b2)
        name = f"mlp BT={BT}"
        bench_one(name, "xla", lambda *a: fs.mlp_sublayer_reference(*a),
                  args)
        bench_one(name, "fused", lambda *a: fs.fused_mlp_sublayer(*a), args)


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
    temporal_and_more()
