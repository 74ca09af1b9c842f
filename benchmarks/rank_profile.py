"""Micro-profile of the two-level rank selection inside bin_gaussians
(binning.py): index build, per-slot binary search, window phase, gathers.

Run: python benchmarks/rank_profile.py
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
import numpy as np

from microbench import timeit

from gvfdiffusion_tpu.ops.rasterize import binning

N = 131072
T = 256  # 16x16 tiles @512/32
K = 256
REPS = 8


def scan(fn, *args):
    @jax.jit
    def run(*args):
        def body(c, _):
            out = fn(*args)
            leaves = [x for x in jax.tree.leaves(out)
                      if hasattr(x, "dtype") and x.dtype != bool]
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return c + s, None
        return jax.lax.scan(body, 0.0, None, length=REPS)[0]
    return timeit(lambda: run(*args), iters=4) / REPS


def main():
    rng = np.random.default_rng(0)
    # realistic intersection density: each gaussian hits ~4 tiles
    inter = jnp.asarray(rng.random((T, N)) < (4.0 / T))
    depths = jnp.asarray(np.sort(rng.random(N)).astype(np.float32))

    t = scan(lambda: binning.build_rank_index(inter).ccum)
    print(f"build_rank_index  {t*1e3:7.2f} ms", flush=True)

    ri = jax.jit(binning.build_rank_index)(inter)
    ri = binning.RankIndex(ic=ri.ic, ccum=ri.ccum, n=N)
    lo = jnp.zeros((T,), jnp.int32)

    t = scan(lambda: binning.rank_select(ri, lo, K))
    print(f"rank_select       {t*1e3:7.2f} ms", flush=True)

    # pieces of rank_select: the chunk search alone (the shipped
    # compare-reduce; an 11-step binary-search fori_loop measured 10.5 ms
    # here — each step a tiny dependent gather kernel, pure latency)
    def search_only():
        targets = lo[:, None] + 1 + jnp.arange(K, dtype=jnp.int32)[None, :]
        t_, c, w = ri.ic.shape
        c_hit = jnp.sum(
            (ri.ccum[:, None, :] < targets[:, :, None]).astype(jnp.int32),
            axis=-1,
        )
        return jnp.minimum(c_hit, c - 1)

    t = scan(search_only)
    print(f"  search (reduce) {t*1e3:7.2f} ms", flush=True)

    c_hit = jax.jit(search_only)()

    # window phase: gather window + cumsum + argmax
    def window_phase():
        t_, c, w = ri.ic.shape
        targets = lo[:, None] + 1 + jnp.arange(K, dtype=jnp.int32)[None, :]
        prev = jnp.where(
            c_hit > 0,
            jnp.take_along_axis(ri.ccum, jnp.maximum(c_hit - 1, 0), axis=1),
            0,
        )
        local_t = targets - prev
        win = jnp.take_along_axis(ri.ic, c_hit[:, :, None], axis=1)
        wcum = jnp.cumsum(win, axis=2)
        pos = jnp.argmax((wcum == local_t[:, :, None]) & (win > 0), axis=2)
        return jnp.minimum(c_hit * w + pos, ri.n - 1)

    t = scan(window_phase)
    print(f"  window phase    {t*1e3:7.2f} ms", flush=True)

    # full bin minus intersect, for reference
    mean2d = jnp.asarray(rng.random((N, 2)).astype(np.float32)) * 512
    data = jnp.asarray(rng.random((N, 8)).astype(np.float32))
    idx, mask = jax.jit(lambda: binning.rank_select(ri, lo, K))()

    t = scan(lambda: jnp.take(data, idx, axis=0))
    print(f"  payload gather  {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
