"""Per-piece timing of align_gaussian_to_canonical at bench shapes: which
stage of the hierarchical sweep regressed e2e alignment 3.7 -> 36 s."""

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


def sync(x):
    jax.device_get(jnp.sum(jax.tree.leaves(x)[0]))


def t(name, fn, *a, iters=2):
    t0 = time.perf_counter()
    sync(fn(*a))
    print(f"[{name}] compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    print(f"[{name}] {best*1e3:.0f} ms", flush=True)
    return best


def main():
    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.representations.gaussians import GaussianSplat

    rng = np.random.default_rng(0)
    G = 131072
    aabb = jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32)
    gs = GaussianSplat(
        _xyz=jnp.asarray(rng.random((G, 3)), jnp.float32),
        _features_dc=jnp.asarray(rng.random((G, 1, 3)), jnp.float32),
        _scaling=jnp.full((G, 3), -5.0, jnp.float32),
        _rotation=jnp.asarray(
            np.tile(np.array([0, 0, 0, 0], np.float32), (G, 1))),
        _opacity=jnp.zeros((G, 1), jnp.float32),
        aabb=aabb,
    )
    valid = jnp.ones((G,), bool)
    renderer = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
        backend="binned", max_per_tile=128,
    ))

    sub = 65536
    gs_c = gs.replace(
        _xyz=gs._xyz[:sub], _features_dc=gs._features_dc[:sub],
        _scaling=gs._scaling[:sub], _rotation=gs._rotation[:sub],
        _opacity=gs._opacity[:sub],
    )
    valid_c = valid[:sub]

    cam0 = orbit_camera(0.0, 0.0, height=512, width=512)

    def rot_z(a):
        c, s = jnp.cos(a), jnp.sin(a)
        z, o = jnp.zeros_like(c), jnp.ones_like(c)
        return jnp.stack([
            jnp.stack([c, -s, z, z], -1),
            jnp.stack([s, c, z, z], -1),
            jnp.stack([z, z, o, z], -1),
            jnp.stack([z, z, z, o], -1),
        ], -2)

    angles = jnp.linspace(0.0, 2 * jnp.pi, 360, endpoint=False)

    # stage A equivalent: 72 views, 128px, 65k subset
    wvs72 = jnp.einsum("ij,ajk->aik", cam0.world_view, rot_z(angles[::5]))

    def stage_a():
        return renderer.render_views(
            gs_c, wvs72, cam0.intrinsics, 128, 128, valid=valid_c, chunk=8
        )["render"]

    t("stageA_72x128px_65k", stage_a)

    # stage B equivalent: 9 views 128px
    wvs9 = jnp.einsum("ij,ajk->aik", cam0.world_view, rot_z(angles[:9]))

    def stage_b():
        return renderer.render_views(
            gs_c, wvs9, cam0.intrinsics, 128, 128, valid=valid_c, chunk=8
        )["render"]

    t("stageB_9x128px_65k", stage_b)

    # fine stage: 5 views, 512px, full 131k
    wvs5 = jnp.einsum("ij,ajk->aik", cam0.world_view, rot_z(angles[:5]))

    def fine():
        return renderer.render_views(
            gs, wvs5, cam0.intrinsics, 512, 512, valid=valid, chunk=8
        )["render"]

    t("fine_5x512px_131k", fine)

    # jitted variants
    t("stageA_jit", jax.jit(stage_a))
    t("fine_jit", jax.jit(fine))


if __name__ == "__main__":
    main()
