"""Direct scan-wrapped timings of XLA building blocks at DiT shapes.

Establishes what XLA's own emitters sustain on this platform (the axon v5e),
so kernel-engineering effort goes only where a Pallas kernel can actually
cut traffic below what XLA streams.

Run: python benchmarks/xla_stream_probe.py
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

R = 16


def bench(name, fn, *args, traffic_mb=0.0, gflop=0.0):
    @jax.jit
    def loop(x, *rest):
        def body(c, _):
            return fn(c, *rest), None
        return jax.lax.scan(body, x, None, length=R)[0]

    t = timeit(lambda: loop(*args), iters=3) / R
    stats = []
    if gflop:
        stats.append(f"{gflop/t/1e3:6.1f} TF/s")
    if traffic_mb:
        stats.append(f"{traffic_mb/1e3/t:6.1f} GB/s eff")
    print(f"{name:<28} {t*1e3:8.2f} ms  " + "  ".join(stats))


def main():
    rows, C = 96 * 512, 512  # BT x N tokens at the dual-CFG DiT shape
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (rows, C), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (C, 4 * C), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(ks[2], (4 * C, C), jnp.bfloat16) * 0.02
    wqkv = jax.random.normal(ks[3], (C, 3 * C), jnp.bfloat16) * 0.02
    wo = jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.02

    # MLP: x@w1 -> gelu -> @w2 (+x). traffic: x r/w 2*50, h w+r 2*201
    def mlp(x):
        h = jnp.dot(x, w1, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=True)
        return x + jnp.dot(h, w2, preferred_element_type=jnp.bfloat16)

    gf = 2 * rows * C * 4 * C * 2 / 1e9
    bench("mlp 4x (xla)", mlp, x, traffic_mb=(2 * 50.3 + 2 * 201.3),
          gflop=gf)

    # qkv + out proj (the per-attention projection cost)
    def proj(x):
        qkv = jnp.dot(x, wqkv, preferred_element_type=jnp.bfloat16)
        q = qkv[:, :C]
        return x + jnp.dot(q, wo, preferred_element_type=jnp.bfloat16)

    gf = 2 * rows * C * 3 * C / 1e9 + 2 * rows * C * C / 1e9
    bench("qkv+out proj (xla)", proj, x,
          traffic_mb=(50.3 * 2 + 151 * 2 + 50.3 * 2), gflop=gf)

    # layernorm + modulate alone
    sc = jax.random.normal(ks[5], (1, C), jnp.bfloat16)

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        v = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = (xf - mu) * jax.lax.rsqrt(v + 1e-6)
        return (h * (1 + sc) + sc).astype(jnp.bfloat16) + x

    bench("layernorm+mod (xla)", ln, x, traffic_mb=2 * 50.3)

    # pure bf16 copy-scale at activation scale
    bench("x*1.0001+1 (xla)", lambda x: x * 1.0001 + 1.0, x,
          traffic_mb=2 * 50.3)


if __name__ == "__main__":
    main()
