"""Does DMA pipeline depth explain Pallas's ~100 GB/s vs XLA's ~300+ GB/s?

Reads a 256 MB HBM-resident array inside ONE Pallas kernel instance via a
manual N-slot async-copy pipeline (N in 2/4/8), accumulating a checksum so
nothing is elided. Pure-read bandwidth per depth tells whether the Mosaic
auto-pipeliner's 2-deep double buffering is the limiter.

Run: python benchmarks/dma_depth_probe.py
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

ROWS = 131072  # x [ROWS, 1024] bf16 = 256 MB


def _read_kernel(x_ref, o_ref, *, slots, chunk):
    n = ROWS // chunk

    def body(scratch, sems):
        def get(i):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * chunk, chunk), :],
                scratch.at[i % slots],
                sems.at[i % slots],
            )

        for i in range(min(slots, n)):
            get(i).start()

        def loop(i, acc):
            get(i).wait()
            acc = acc + jnp.sum(scratch[i % slots].astype(jnp.float32))

            @pl.when(i + slots < n)
            def _():
                get(i + slots).start()

            return acc

        acc = jax.lax.fori_loop(0, n, loop, jnp.float32(0))
        o_ref[0, 0] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((slots, chunk, 1024), jnp.bfloat16),
        sems=pltpu.SemaphoreType.DMA((slots,)),
    )


def bench_read(slots, chunk):
    x = jnp.ones((ROWS, 1024), jnp.bfloat16)
    kernel = functools.partial(_read_kernel, slots=slots, chunk=chunk)

    def call(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(x)

    @jax.jit
    def fn(x):
        def body(c, _):
            return c + call(x)[0, 0], None
        return jax.lax.scan(body, jnp.float32(0), None, length=4)[0]

    t = timeit(lambda: fn(x), iters=3) / 4
    gb = x.size * 2 / 1e9
    print(f"read slots={slots} chunk={chunk:5d} rows "
          f"({chunk*2048//1024} KB): {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s")


def main():
    for slots, chunk in [(2, 512), (4, 512), (8, 512), (4, 1024), (8, 1024),
                         (2, 2048), (4, 2048), (8, 256), (16, 256)]:
        if slots * chunk * 2048 > 14 * 1024 * 1024:
            continue
        try:
            bench_read(slots, chunk)
        except Exception as e:
            print(f"slots={slots} chunk={chunk} FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
