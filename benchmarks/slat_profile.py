"""SLat-flow per-component cost sheet via whole-program ablation deltas.

Same method as dit_profile.py: compile ONE full-size SLat flow call (the
guidance-interval sampler's body at bench shapes — 16384 active voxels at
64^3, torso 4096, cond 1370 DINOv2 tokens, 2B CFG batch) with a component
removed (`ablate` on SLatFlowModel) and attribute the cost by delta.

Run: python benchmarks/slat_profile.py
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


def build(ablate=()):
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    L_VOX = 16384
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32

    lin = rng.choice(64 ** 3, size=L_VOX, replace=False)
    coords = np.stack([lin // 4096, (lin // 64) % 64, lin % 64], -1)
    structure = SparseVoxels(
        feats=jnp.zeros((1, L_VOX, 8)),
        coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, L_VOX), bool),
        resolution=64,
    )
    model = SLatFlowModel(torso_capacity=4096, ablate=tuple(ablate), dtype=dtype)
    key = jax.random.PRNGKey(0)
    cond = jnp.asarray(rng.standard_normal((1, 1370, 1024)), jnp.float32)
    params = model.init(key, structure, jnp.zeros((1,)), cond)

    # one CFG-batched call (2B), the per-step body inside the cfg interval
    st2 = structure.replace(
        feats=jnp.tile(structure.feats, (2, 1, 1)),
        coords=jnp.tile(structure.coords, (2, 1, 1)),
        valid=jnp.tile(structure.valid, (2, 1)),
    )
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)])

    @jax.jit
    def one_call(params, feats, cond2):
        x = st2.replace(feats=feats)
        return model.apply(params, x, jnp.full((2,), 0.5), cond2).feats

    feats = jnp.asarray(rng.standard_normal((2, L_VOX, 8)), jnp.float32)
    return one_call, params, feats, cond2


VARIANTS = [
    ("full", ()),
    ("no-self", ("self",)),
    ("no-cross", ("cross",)),
    ("no-mlp", ("mlp",)),
    ("no-torso", ("torso",)),
    ("no-io", ("io",)),
    ("no-down-conv", ("down_conv",)),
    ("no-up-conv", ("up_conv",)),
    ("no-pe", ("pe",)),
]


def main():
    results = {}
    for name, ab in VARIANTS:
        fn, params, feats, cond2 = build(ablate=ab)
        dt = timeit(lambda: fn(params, feats, cond2), iters=5)
        results[name] = dt
        print(f"[{name}] {dt*1e3:.1f} ms", file=sys.stderr)
    full = results["full"]
    print("\n=== component deltas (one 2B call; x12 steps for the stage) ===")
    for name, dt in results.items():
        if name == "full":
            print(f"{name:12s} {dt*1e3:8.1f} ms")
        else:
            print(f"{name:12s} {dt*1e3:8.1f} ms  component ~ {(full-dt)*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
