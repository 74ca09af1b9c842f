"""Denoise-loop variants on the chip: fp32 vs bf16 resident params, and the
fused-attention kernel on/off (GVF_ATTN). Whole-program timing only (per-op
timing bottoms out at the dispatch floor, see denoise_breakdown.py).

Run: python benchmarks/denoise_variants.py
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


def main():
    import bench as bench_mod

    sample, noise, params, cond = bench_mod.build_denoise()
    print(f"devices: {jax.devices()}")

    t32 = timeit(lambda: sample(noise, params, cond), iters=2, warmup=1)
    print(f"  fp32 params      {t32*1e3:8.0f} ms / 32 steps")

    bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    t16 = timeit(lambda: sample(noise, bf16, cond), iters=2, warmup=1)
    print(f"  bf16 params      {t16*1e3:8.0f} ms / 32 steps")


if __name__ == "__main__":
    main()
