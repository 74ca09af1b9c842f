"""Azimuth-alignment cost vs (coarse_subset, coarse_res, batch) — the bench
scene (SLat GS decode output, ~131k gaussians) scored over 360 candidates.

The per-angle coarse cost is dominated by projecting + per-tile top_k over
the subset, so the subset size is the lever (BENCH_NOTES round-2: 64k subset
took 7.2 -> 4.0 s). This sweeps smaller subsets and checks the chosen angle
stays identical on the same scene.

Run: python benchmarks/align_bench.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    jax.device_get(jnp.sum(x._xyz) if hasattr(x, "_xyz") else jnp.sum(x))


def main():
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels
    from gvfdiffusion_tpu.utils.inference_utils import align_gaussian_to_canonical

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    L_VOX = 16384
    lin = rng.choice(64**3, size=L_VOX, replace=False)
    coords = np.stack([lin // 4096, (lin // 64) % 64, lin % 64], -1)
    slat = SparseVoxels(
        feats=jnp.asarray(rng.standard_normal((1, L_VOX, 8)), jnp.float32),
        coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, L_VOX), bool),
        resolution=64,
    )
    gs_dec = SLatGaussianDecoder(dtype=dtype)
    gs_params = gs_dec.init(key, slat)
    gs_b, gs_valid = jax.jit(lambda p, s: gs_dec.apply(p, s))(gs_params, slat)
    gs0 = gs_b.replace(
        _xyz=gs_b._xyz[0], _features_dc=gs_b._features_dc[0],
        _scaling=gs_b._scaling[0], _rotation=gs_b._rotation[0],
        _opacity=gs_b._opacity[0],
    )
    valid0 = gs_valid[0]
    target = jnp.ones((512, 512, 3))

    variants = [
        ("subset 64k res 128 (shipped)", dict()),
        ("subset 16k res 128", dict(coarse_subset=16384)),
        ("subset 16k res 96", dict(coarse_subset=16384, coarse_res=96)),
        ("subset 8k  res 96", dict(coarse_subset=8192, coarse_res=96)),
        ("subset 16k res 128 refine 4", dict(coarse_subset=16384, refine=4)),
    ]
    angles = {}
    for name, kw in variants:
        t0 = time.perf_counter()
        aligned, ang, scale = align_gaussian_to_canonical(
            gs0, target, valid=valid0, n_angles=360, **kw)
        _sync(aligned)
        dt = time.perf_counter() - t0
        # warm second run (first includes compiles)
        t0 = time.perf_counter()
        aligned, ang, scale = align_gaussian_to_canonical(
            gs0, target, valid=valid0, n_angles=360, **kw)
        _sync(aligned)
        dt2 = time.perf_counter() - t0
        angles[name] = ang
        print(f"{name:32s} cold {dt:6.1f}s warm {dt2:6.2f}s angle {ang:.4f}")
    base = angles[variants[0][0]]
    for name, ang in angles.items():
        flag = "SAME" if abs(ang - base) < 1e-6 else "DIFFERS"
        print(f"  argmax {name:32s} {flag}")


if __name__ == "__main__":
    main()
