"""Direct timing of the fused narrow-head attention kernel at the DiT hot
shapes (spatial Lq=Lk=512; image-cross Lk=1370; static-cross Lk=512), B=96
(= 3-way CFG x 32 frames), H=16, D=32.

Run: python benchmarks/attn_kernel_bench.py
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


def main():
    B, H, D = 96, 16, 32
    REPS = 20  # scan the kernel REPS times in ONE program: a single ~3-8 ms
    # call is invisible under the ~25-30 ms axon dispatch floor
    dt = jnp.bfloat16
    for name, lq, lk in [("spatial", 512, 512), ("img_cross", 512, 1370),
                         ("static_cross", 512, 512)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, lq, H, D), dt)
        k = jax.random.normal(ks[1], (B, lk, H, D), dt)
        v = jax.random.normal(ks[2], (B, lk, H, D), dt)

        @jax.jit
        def fn(q, k, v):
            def body(x, _):
                return fa.fused_attention(x, k, v, D**-0.5), None
            return jax.lax.scan(body, q, None, length=REPS)[0]

        t = timeit(lambda: fn(q, k, v), iters=5) / REPS
        flops = 4 * B * H * lq * lk * D
        print(f"{name:14s} Lq={lq} Lk={lk}: {t*1e3:7.2f} ms   "
              f"{flops/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
