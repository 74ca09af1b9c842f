"""Tile-binned rasterizer vs dense reference renderer; Pallas kernel in
interpreter mode; differentiability of the binned path."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.ops.rasterize.binning import bin_gaussians, compute_radius
from gvfdiffusion_tpu.ops.rasterize.xla_blend import blend_tiles
from gvfdiffusion_tpu.render import reference_renderer as rr
from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat


def make_scene(n=40, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0.3, 0.7, (n, 3)).astype(np.float32)
    dc = rng.uniform(-1, 1, (n, 1, 3)).astype(np.float32)
    gs = GaussianSplat(
        _xyz=jnp.asarray(xyz),
        _features_dc=jnp.asarray(dc),
        _scaling=jnp.asarray(rng.normal(0, 0.3, (n, 3)).astype(np.float32)) + 1.0,
        _rotation=jnp.asarray(rng.normal(0, 0.2, (n, 4)).astype(np.float32)),
        _opacity=jnp.asarray(rng.normal(2.0, 1.0, (n, 1)).astype(np.float32)),
        aabb=jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32),
        scaling_bias=0.02,
    )
    cam = Camera(
        world_view=jnp.asarray(lookat_extrinsics([0.0, -1.2, 0.3])),
        intrinsics=jnp.asarray(fov_intrinsics(50.0)),
        height=64, width=64, near=0.1, far=10.0,
    )
    return gs, cam


def test_compute_radius_isotropic():
    cov = jnp.eye(2)[None] * 4.0  # sigma = 2
    r = compute_radius(cov)
    # eigenvalue floor of 0.1 (as in the CUDA rasterizer) makes
    # lam = 4 + sqrt(0.1); radius = ceil(3 * sqrt(lam)) = 7
    np.testing.assert_allclose(np.asarray(r), 7.0)


def test_binned_matches_reference():
    gs, cam = make_scene()
    ref = rr.render(gs, cam, bg_color=(1.0, 1.0, 1.0))
    opts = RenderOptions(
        near=cam.near, far=cam.far, bg_color=(1.0, 1.0, 1.0), use_mip=False,
        backend="binned", tile=32, max_per_tile=64,
    )
    out = GaussianRenderer(opts).render(gs, cam)
    # K=64 > N=40: no truncation -> must match the dense reference closely
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(ref["render"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["alpha"]), np.asarray(ref["alpha"]), atol=2e-4
    )


def test_binned_truncation_degrades_gracefully():
    gs, cam = make_scene(n=100)
    full = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, use_mip=False, backend="binned", max_per_tile=128,
    )).render(gs, cam)
    trunc = GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, use_mip=False, backend="binned", max_per_tile=32,
    )).render(gs, cam)
    # dropping the farthest gaussians changes little (they're occluded)
    err = np.abs(np.asarray(full["render"]) - np.asarray(trunc["render"])).mean()
    assert err < 0.05


def test_binned_gradients():
    gs, cam = make_scene(n=20)
    opts = RenderOptions(near=0.1, far=10.0, use_mip=False, backend="binned",
                         max_per_tile=32)
    renderer = GaussianRenderer(opts)
    target = jnp.zeros((64, 64, 3))

    def loss(g):
        return jnp.mean((renderer.render(g, cam)["render"] - target) ** 2)

    grads = jax.grad(loss)(gs)
    for name in ["_xyz", "_features_dc", "_scaling", "_opacity"]:
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
        assert np.abs(g).max() > 0, f"zero grad for {name}"


def test_pallas_kernel_interpret_matches_blend():
    from gvfdiffusion_tpu.ops.rasterize import pallas_kernel as pk
    import jax.experimental.pallas as pl

    gs, cam = make_scene(n=30)
    proj = rr.project_gaussians(gs.get_xyz, gs.get_scaling, gs.get_rotation, cam)
    colors = jnp.abs(gs.get_features[:, 0, :])
    binned = bin_gaussians(
        proj["mean2d"], proj["cov2d"], colors, gs.get_opacity[:, 0],
        proj["depth"], proj["in_front"], cam.height, cam.width,
        tile=32, max_per_tile=64,
    )
    bg = jnp.asarray([1.0, 1.0, 1.0])
    rgb_x, dep_x, acc_x = blend_tiles(binned, cam.height, cam.width, bg)

    import jax.experimental.pallas as _pl
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        rgb_p, dep_p, acc_p = pk.rasterize_pallas(binned, cam.height, cam.width, bg)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_x), atol=1e-4)


def test_delta_and_ssaa_through_renderer():
    gs, cam = make_scene(n=16)
    opts = RenderOptions(near=0.1, far=10.0, use_mip=True, kernel_size_2d=0.1,
                         backend="binned", max_per_tile=32, ssaa=2)
    renderer = GaussianRenderer(opts)
    out0 = renderer.render(gs, cam)
    assert out0["render"].shape == (64, 64, 3)
    delta = jnp.zeros((16, 14)).at[:, 0].set(0.2)
    out1 = renderer.render(gs, cam, delta=delta)
    assert np.abs(np.asarray(out1["render"]) - np.asarray(out0["render"])).max() > 1e-3
