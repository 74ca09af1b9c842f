"""Reference renderer tests: analytic single-Gaussian checks, occlusion
ordering, differentiability, delta application."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.ops.quaternion import build_covariance, quat_to_rotmat
from gvfdiffusion_tpu.ops.sh import rgb_from_sh_dc
from gvfdiffusion_tpu.render import reference_renderer as rr
from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat


def make_camera(h=32, w=32):
    return Camera(
        world_view=jnp.asarray(lookat_extrinsics([0.0, -2.0, 0.0])),
        intrinsics=jnp.asarray(fov_intrinsics(45.0)),
        height=h,
        width=w,
    )


def make_gs(xyz, colors, scale=0.05, opacity_raw=6.0):
    """Build a GaussianSplat whose activated values are predictable.

    colors: desired rgb in [0,1]; dc = (rgb - 0.5)/C0.
    """
    n = len(xyz)
    dc = (np.asarray(colors) - 0.5) / 0.28209479177387814
    return GaussianSplat(
        _xyz=jnp.asarray(xyz, jnp.float32),
        _features_dc=jnp.asarray(dc, jnp.float32)[:, None, :],
        _scaling=jnp.full((n, 3), np.log(scale) - np.log(0.01), jnp.float32),
        _rotation=jnp.zeros((n, 4), jnp.float32),
        _opacity=jnp.full((n, 1), opacity_raw, jnp.float32),
        aabb=jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32),
    )


def test_quat_rotmat_identity_and_orthonormal():
    q = jnp.array([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]])
    r = quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(r[0]), np.eye(3), atol=1e-6)
    rtr = np.asarray(r[1] @ r[1].T)
    np.testing.assert_allclose(rtr, np.eye(3), atol=1e-6)


def test_build_covariance_isotropic():
    s = jnp.array([[0.2, 0.2, 0.2]])
    q = jnp.array([[0.7, 0.1, -0.3, 0.2]])
    cov = build_covariance(s, q)
    np.testing.assert_allclose(np.asarray(cov[0]), 0.04 * np.eye(3), atol=1e-6)


def test_center_gaussian_renders_centered_blob():
    gs = make_gs([[0.5, 0.5, 0.5]], [[1.0, 0.0, 0.0]])  # world origin, red
    cam = make_camera()
    out = rr.render(gs, cam, bg_color=(0.0, 0.0, 0.0))
    img = np.asarray(out["render"])
    assert img.shape == (32, 32, 3)
    cy, cx = np.unravel_index(np.argmax(img[..., 0]), (32, 32))
    assert abs(cy - 16) <= 1 and abs(cx - 16) <= 1
    # center is red-ish, corner is background
    assert img[cy, cx, 0] > 0.5
    np.testing.assert_allclose(img[0, 0], 0.0, atol=1e-3)
    # alpha peaked at center
    alpha = np.asarray(out["alpha"])
    assert alpha[cy, cx] > 0.75 and alpha[0, 0] < 1e-3


def test_depth_ordering_occlusion():
    # red gaussian nearer to camera (camera at y=-2), blue behind
    gs = make_gs(
        [[0.5, 0.3, 0.5], [0.5, 0.7, 0.5]],
        [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
        scale=0.08,
        opacity_raw=12.0,  # nearly opaque
    )
    cam = make_camera()
    img = np.asarray(rr.render(gs, cam)["render"])
    cy, cx = 16, 16
    assert img[cy, cx, 0] > 0.85  # red wins
    assert img[cy, cx, 2] < 0.1


def test_bg_color_composited():
    gs = make_gs([[0.5, 0.5, 0.5]], [[1.0, 0.0, 0.0]], scale=0.02)
    cam = make_camera()
    img = np.asarray(rr.render(gs, cam, bg_color=(0.0, 1.0, 0.0))["render"])
    np.testing.assert_allclose(img[0, 0], [0.0, 1.0, 0.0], atol=1e-3)


def test_mip_compensation_shrinks_small_gaussians():
    gs = make_gs([[0.5, 0.5, 0.5]], [[1.0, 1.0, 1.0]], scale=0.001)
    cam = make_camera()
    plain = np.asarray(rr.render(gs, cam, mip=False)["alpha"]).max()
    mip = np.asarray(rr.render(gs, cam, mip=True, kernel_size_2d=0.1)["alpha"]).max()
    assert mip < plain  # tiny gaussian gets opacity-compensated down


def test_gradients_flow_to_all_attributes():
    gs = make_gs([[0.45, 0.5, 0.5], [0.55, 0.5, 0.5]], [[1, 0, 0], [0, 1, 0]])
    # anisotropic scales: isotropic Gaussians have rotation-invariant
    # covariance, which would make the rotation gradient legitimately zero
    gs = gs.replace(
        _scaling=gs._scaling + jnp.asarray([[0.5, -0.5, 0.0], [0.0, 0.5, -0.5]])
    )
    cam = make_camera(16, 16)
    target = jnp.zeros((16, 16, 3))

    def loss(g):
        return jnp.mean((rr.render(g, cam)["render"] - target) ** 2)

    grads = jax.grad(loss)(gs)
    for name in ["_xyz", "_features_dc", "_scaling", "_rotation", "_opacity"]:
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
        assert np.abs(g).max() > 0, f"zero grad for {name}"


def test_delta_moves_gaussian():
    gs = make_gs([[0.5, 0.5, 0.5]], [[1.0, 0.0, 0.0]])
    cam = make_camera()
    delta = jnp.zeros((1, 14)).at[0, 0].set(0.25)  # shift +x
    out0 = np.asarray(rr.render(gs, cam)["render"])
    out1 = np.asarray(rr.render(gs, cam, delta=delta)["render"])
    c0 = np.unravel_index(np.argmax(out0[..., 0]), (32, 32))
    c1 = np.unravel_index(np.argmax(out1[..., 0]), (32, 32))
    assert c1[1] != c0[1]  # peak moved horizontally
    # opacity delta: large negative delta fades the gaussian
    delta2 = jnp.zeros((1, 14)).at[0, 13].set(-20.0)
    out2 = np.asarray(rr.render(gs, cam, delta=delta2)["alpha"])
    assert out2.max() < 1e-3


def test_valid_mask_hides_gaussians():
    gs = make_gs([[0.5, 0.5, 0.5], [0.3, 0.5, 0.5]], [[1, 0, 0], [0, 1, 0]])
    cam = make_camera()
    out = rr.render(gs, cam, valid=jnp.array([True, False]))
    img = np.asarray(out["render"])
    assert img[..., 1].max() < 1e-3  # green gaussian masked out
    assert img[..., 0].max() > 0.3


def test_sh_dc_color_mapping():
    dc = jnp.array([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(rgb_from_sh_dc(dc)), 0.5)
