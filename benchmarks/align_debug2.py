"""Instrumented alignment run at REAL bench shapes (SLat decoder output) to
find where the 36 s goes (align_debug.py's synthetic splats total ~3 s)."""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels
    from gvfdiffusion_tpu.utils import inference_utils as iu

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
    print("gs dtype:", gs0._xyz.dtype, "scaling stats:",
          float(jnp.exp(gs0._scaling.astype(jnp.float32)).mean()),
          float(jnp.exp(gs0._scaling.astype(jnp.float32)).max()), flush=True)

    # monkeypatch timing around score_at by wrapping render_views
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer

    orig = GaussianRenderer.render_views

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        jax.block_until_ready(out["render"])
        v = a[1].shape[0] if len(a) > 1 else kw["world_views"].shape[0]
        h = a[4] if len(a) > 4 else kw.get("height")
        print(f"  render_views V={v} res={h}: "
              f"{time.perf_counter()-t0:.2f}s", flush=True)
        return out

    GaussianRenderer.render_views = timed

    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        aligned, ang, scale = iu.align_gaussian_to_canonical(
            gs0, target, valid=valid0, n_angles=360)
        jax.block_until_ready(aligned._xyz)
        print(f"[{run}] total {time.perf_counter()-t0:.1f}s angle={ang:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
