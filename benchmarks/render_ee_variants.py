"""Early-exit rasterizer option search at the sweep shape (131k gaussians,
512^2): per-round slice size x rounds x tile size. The reference CUDA
rasterizer terminates a pixel at T < 1e-4 (diff-gaussian-rasterization
forward.cu), which is exactly the early_exit rule — so these variants keep
the reference's blend semantics while cutting saturated-tile work.

Run: python benchmarks/render_ee_variants.py
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

from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat

N = 131072
H = W = 512
REPS = 8


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
    cam = orbit_camera(0.3, 0.0, height=H, width=W)

    def scan_render(opt):
        r = GaussianRenderer(opt)

        @jax.jit
        def run():
            def body(c, _):
                out = r.render(gs, cam)["render"]
                return c + jnp.sum(out), None
            return jax.lax.scan(body, 0.0, None, length=REPS)[0]

        return timeit(lambda: run(), iters=4) / REPS

    base = dict(near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
                backend="binned")
    variants = [
        ("1round_k256_t32", dict(max_per_tile=256, rounds=1, tile=32)),
        ("ee_64x4_t32", dict(max_per_tile=64, rounds=4, early_exit=True, tile=32)),
        ("ee_32x8_t32", dict(max_per_tile=32, rounds=8, early_exit=True, tile=32)),
        ("ee_64x4_t16", dict(max_per_tile=64, rounds=4, early_exit=True, tile=16)),
        ("ee_128x2_t64", dict(max_per_tile=128, rounds=2, early_exit=True, tile=64)),
        ("ee_64x8_t32", dict(max_per_tile=64, rounds=8, early_exit=True, tile=32)),
    ]
    for name, kw in variants:
        t = scan_render(RenderOptions(**base, **kw))
        print(f"{name:16s} {t*1e3:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
