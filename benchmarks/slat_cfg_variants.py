"""Compare CFG execution strategies for the 12-step SLat flow on the chip.

  a) two calls/step + where-select        (round-1 shipped form)
  b) two calls/step + lax.cond skip      (skip neg outside cfg_interval)
  c) 2B batched call + lax.cond skip     (flow_euler's cfg_batched=True)

Run: python benchmarks/slat_cfg_variants.py
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


def main():
    from gvfdiffusion_tpu.diffusion.flow_euler import (
        FlowEulerGuidanceIntervalSampler, t_schedule)
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    L_VOX = 16384
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    lin = rng.choice(64**3, size=L_VOX, replace=False)
    coords = np.stack([lin // 4096, (lin // 64) % 64, lin % 64], -1)
    structure = SparseVoxels(
        feats=jnp.zeros((1, L_VOX, 8)),
        coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, L_VOX), bool),
        resolution=64,
    )
    flow = SLatFlowModel(torso_capacity=4096, dtype=dtype)
    cond = jnp.asarray(rng.standard_normal((1, 1370, 1024)), jnp.float32)
    params = flow.init(key, structure, jnp.zeros((1,)), cond)
    noise = jnp.asarray(rng.standard_normal((1, L_VOX, 8)), jnp.float32)

    def model(params, x_feats, t, cc):
        b = x_feats.shape[0]
        st = structure
        if b != 1:
            st = structure.replace(
                feats=jnp.tile(structure.feats, (b, 1, 1)),
                coords=jnp.tile(structure.coords, (b, 1, 1)),
                valid=jnp.tile(structure.valid, (b, 1)),
            )
        x = st.replace(feats=x_feats)
        return flow.apply(params, x, t, cc).feats

    sampler = FlowEulerGuidanceIntervalSampler()
    neg = jnp.zeros_like(cond)
    kw = dict(steps=12, cfg_strength=3.0, cfg_interval=(0.5, 1.0))

    def variant_a(params, noise, cond):
        # round-1 form: both calls every step, where-select
        ts = jnp.asarray(t_schedule(12, 1.0), jnp.float32)

        def step(x, tt):
            t, t_prev = tt
            tb = jnp.full((1,), 1000.0 * t)
            pred = model(params, x, tb, cond)
            ng = model(params, x, tb, neg)
            g = 4.0 * pred - 3.0 * ng
            in_i = jnp.logical_and(t >= 0.5, t <= 1.0)
            v = jnp.where(in_i, g, pred)
            return x - (t - t_prev) * v, None

        pairs = jnp.stack([ts[:-1], ts[1:]], axis=1)
        x, _ = jax.lax.scan(step, noise, pairs)
        return x

    def variant_b(params, noise, cond):
        return sampler.sample(
            model=lambda x, t, c: model(params, x, t, c), noise=noise,
            cond=cond, neg_cond=neg, cfg_batched=False, **kw)["samples"]

    def variant_c(params, noise, cond):
        return sampler.sample(
            model=lambda x, t, c: model(params, x, t, c), noise=noise,
            cond=cond, neg_cond=neg, cfg_batched=True, **kw)["samples"]

    print(f"devices: {jax.devices()}")
    for name, fn in (("a 2call+where", variant_a),
                     ("b 2call+cond", variant_b),
                     ("c batched+cond", variant_c)):
        f = jax.jit(fn)
        t = timeit(lambda: f(params, noise, cond), iters=3, warmup=1)
        print(f"  {name:<16} {t*1e3:8.0f} ms / 12 steps")


if __name__ == "__main__":
    main()
