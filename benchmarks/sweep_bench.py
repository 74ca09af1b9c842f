"""Full output-sweep render throughput — BASELINE config #2's tracked metric.

The reference's render_and_save_images sweeps 128 azimuths x 32 timesteps =
4096 CUDA renders @512^2 (reference utils/inference_utils.py:209-306,
azimuths = arange(0, 360, 360/128), range(32) timesteps). Here the whole
sweep is ONE jitted program per timestep chunk: render_views maps the
projection/binning/blend over the 128 views while the per-timestep delta
application is shared.

Run: python benchmarks/sweep_bench.py  [N_GAUSS=131072 T=32 V=128]
"""

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

from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat

N = int(os.environ.get("N_GAUSS", 131072))
T = int(os.environ.get("T", 32))
V = int(os.environ.get("V", 128))
H = W = 512


def main():
    rng = np.random.default_rng(0)
    aabb = jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32)
    gs = GaussianSplat(
        _xyz=jnp.asarray(rng.random((N, 3)), jnp.float32),
        _features_dc=jnp.asarray(rng.random((N, 1, 3)), jnp.float32),
        _scaling=jnp.full((N, 3), -5.5, jnp.float32),
        _rotation=jnp.zeros((N, 4), jnp.float32),
        _opacity=jnp.zeros((N, 1), jnp.float32),
        aabb=aabb,
    )
    # inference configuration: early-exit multiround (K_eff = 128x2 = 256,
    # tile 64) — same truncation depth as the old single-round K=256, same
    # T<1e-4 termination rule as the reference CUDA rasterizer, 17.3 ->
    # 11.0 ms/frame (benchmarks/render_ee_variants.py). GVF_SWEEP_1ROUND=1
    # measures the single-round differentiable path instead.
    if os.environ.get("GVF_SWEEP_1ROUND") == "1":
        opts = RenderOptions(
            near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
            backend="binned", max_per_tile=256)
    else:
        opts = RenderOptions(
            near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
            backend="binned", max_per_tile=128, rounds=2, early_exit=True,
            tile=64)
    renderer = GaussianRenderer(opts)

    azimuths = np.arange(0, 360, 360 / V)
    cams = [orbit_camera(0.0, np.deg2rad(a), radius=2.0, height=H, width=W)
            for a in azimuths]
    world_views = jnp.stack([c.world_view for c in cams])
    intrinsics = jnp.stack([c.intrinsics for c in cams])
    deltas = jnp.asarray(
        rng.normal(size=(T, N, 14)).astype(np.float32) * 0.01)

    @jax.jit
    def one_timestep(delta):
        out = renderer.render_views(
            gs, world_views, intrinsics, H, W, delta=delta, chunk=8)
        return jnp.sum(out["render"])  # reduce so only a scalar returns

    # warm (compile)
    t0 = time.perf_counter()
    one_timestep(deltas[0]).block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    acc = 0.0
    for ti in range(T):
        acc += float(one_timestep(deltas[ti]))  # scalar fetch = hard sync
    dt = time.perf_counter() - t0
    frames = T * V
    print(f"sweep {T}x{V} @512^2, {N} gaussians: {dt:.2f} s "
          f"({dt / frames * 1e3:.2f} ms/frame, {frames / dt:.1f} FPS)")


if __name__ == "__main__":
    main()
