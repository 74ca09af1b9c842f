"""Where does the SLat-flow model call spend its 113 ms? Whole-call timing
of config ablations at inference shape (16384 voxels, torso 4096).

Run: python benchmarks/slat_flow_ablations.py
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
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    L_VOX = 16384
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    lin = rng.choice(64**3, size=L_VOX, replace=False)
    coords = np.stack([lin // 4096, (lin // 64) % 64, lin % 64], -1)
    x = SparseVoxels(
        feats=jnp.asarray(rng.standard_normal((1, L_VOX, 8)), jnp.float32),
        coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, L_VOX), bool),
        resolution=64,
    )
    cond = jnp.asarray(rng.standard_normal((1, 1370, 1024)), jnp.float32)
    t = jnp.zeros((1,))

    print(f"devices: {jax.devices()}")
    variants = [
        ("full (24 blocks, torso 4096)", dict(torso_capacity=4096)),
        ("io-only (0 torso blocks)", dict(torso_capacity=4096, num_blocks=0)),
        ("no-compaction (torso 16384)", dict(torso_capacity=None)),
        ("12 torso blocks", dict(torso_capacity=4096, num_blocks=12)),
    ]
    for name, kw in variants:
        model = SLatFlowModel(dtype=dtype, **kw)
        params = model.init(key, x, t, cond)
        f = jax.jit(lambda p, xx, tt, cc: model.apply(p, xx, tt, cc).feats)
        dt = timeit(lambda: f(params, x, t, cond), iters=3, warmup=1)
        print(f"  {name:<30} {dt*1e3:8.1f} ms / call")


if __name__ == "__main__":
    main()
