"""FlexiCubes extraction: dual vertices (beta), alpha reweighting, gamma quad
split, training center-vertex mode, and the SLat mesh decoder's 21-weight
head. Reference semantics:
/root/reference/trellis/representations/mesh/flexicubes/flexicubes.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.ops.flexicubes import (
    CUBE_EDGES, FlexiMesh, flexicubes_dense, normalize_weights,
)


def sphere_sdf(r_grid, center=(0.5, 0.5, 0.5), radius=0.3):
    g = np.arange(r_grid + 1) / r_grid
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (
        np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2
                + (z - center[2]) ** 2) - radius
    ).astype(np.float32)


def test_normalize_weights_neutral_at_zero():
    beta, alpha, gamma = normalize_weights(jnp.zeros((5, 21)))
    np.testing.assert_allclose(np.asarray(beta), 1.0)
    np.testing.assert_allclose(np.asarray(alpha), 1.0)
    np.testing.assert_allclose(np.asarray(gamma), 0.5, atol=1e-6)


def test_sphere_surface_and_winding():
    r = 16
    sdf = jnp.asarray(sphere_sdf(r))
    mesh = flexicubes_dense(sdf)
    fv = np.asarray(mesh.face_valid)
    assert fv.sum() > 200
    f = np.asarray(mesh.faces)[fv]
    v = np.asarray(mesh.verts)
    # dual vertices of surface faces lie near the sphere
    d = np.linalg.norm(v[f.reshape(-1)] - 0.5, axis=-1)
    np.testing.assert_allclose(d, 0.3, atol=0.06)
    # outward winding: face normal . (centroid - center) > 0
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(b - a, c - a)
    centroid = (a + b + c) / 3 - 0.5
    dots = (n * centroid).sum(-1)
    good = (dots > 0).mean()
    assert good > 0.99, f"only {good:.2%} faces wind outward"


def test_zero_raw_weights_match_none():
    r = 8
    sdf = jnp.asarray(sphere_sdf(r))
    a = flexicubes_dense(sdf)
    b = flexicubes_dense(sdf, weights=jnp.zeros((r, r, r, 21)))
    np.testing.assert_allclose(np.asarray(a.verts), np.asarray(b.verts),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.faces), np.asarray(b.faces))


def test_beta_moves_dual_vertex():
    """Raising one edge's beta pulls the cube's dual vertex toward that
    edge's crossing point (flexicubes.py:310-313)."""
    r = 8
    sdf = jnp.asarray(sphere_sdf(r))
    base = flexicubes_dense(sdf)
    # find a surface cube: a valid face's first vertex slot
    fv = np.asarray(base.face_valid)
    cube = int(np.asarray(base.faces)[fv][0, 0])
    # uneven betas across all 12 edges (a bump on a single edge can land on
    # a non-crossing edge, which is masked out of the average)
    w = jnp.zeros((r * r * r, 21)).at[cube, :12].set(
        jnp.linspace(-2.0, 2.0, 12)).reshape(r, r, r, 21)
    moved = flexicubes_dense(sdf, weights=w)
    delta = np.linalg.norm(
        np.asarray(moved.verts[cube]) - np.asarray(base.verts[cube]))
    assert delta > 1e-4
    # and only that cube's vertex moves
    others = np.delete(np.asarray(moved.verts) - np.asarray(base.verts),
                       cube, axis=0)
    assert np.abs(others).max() < 1e-6


def test_alpha_moves_crossings():
    r = 8
    sdf = jnp.asarray(sphere_sdf(r))
    base = flexicubes_dense(sdf)
    w = jnp.zeros((r, r, r, 21)).at[..., 12].set(3.0)  # alpha of corner 0
    moved = flexicubes_dense(sdf, weights=w)
    assert np.abs(np.asarray(moved.verts) - np.asarray(base.verts)).max() > 1e-4


def test_gamma_flips_quad_diagonal():
    """gamma products pick quad_split_1 vs quad_split_2
    (flexicubes.py:356-364)."""
    r = 8
    sdf = jnp.asarray(sphere_sdf(r))
    lo = flexicubes_dense(sdf, weights=jnp.full((r, r, r, 21), 0.0))
    # gamma raw -> sigmoid: large negative = tiny gamma everywhere except
    # one cube: different per-cube gammas change diagonal choices
    w = jnp.zeros((r, r, r, 21))
    w = w.at[..., 20].set(jnp.asarray(
        np.random.default_rng(0).standard_normal((r, r, r)) * 4))
    hi = flexicubes_dense(sdf, weights=w)
    fv = np.asarray(lo.face_valid)
    assert (np.asarray(lo.faces)[fv] != np.asarray(hi.faces)[fv]).any()
    # vertices are unchanged by gamma (it only picks the diagonal)
    np.testing.assert_allclose(np.asarray(lo.verts), np.asarray(hi.verts),
                               atol=1e-6)


def test_training_mode_center_vertices_and_grads():
    r = 8
    sdf0 = sphere_sdf(r)

    def loss(offset):
        mesh = flexicubes_dense(jnp.asarray(sdf0) + offset, training=True)
        pts = mesh.verts[mesh.faces.reshape(-1)]
        w = mesh.face_valid.repeat(3).astype(jnp.float32)
        d = jnp.linalg.norm(pts - 0.5, axis=-1)
        return jnp.sum(d * w) / jnp.maximum(w.sum(), 1.0)

    mesh = flexicubes_dense(jnp.asarray(sdf0), training=True)
    n_cubes = r ** 3
    assert mesh.verts.shape[0] > n_cubes  # center vertices appended
    assert int(mesh.face_valid.sum()) % 4 == 0  # 4 tris per quad
    g = jax.grad(loss)(jnp.float32(0.0))
    assert np.isfinite(float(g)) and float(g) < 0


def test_training_grads_flow_to_weights():
    r = 8
    sdf = jnp.asarray(sphere_sdf(r))

    def loss(w):
        mesh = flexicubes_dense(sdf, weights=w, training=True)
        return jnp.sum(mesh.verts ** 2)

    g = jax.grad(loss)(jnp.zeros((r, r, r, 21)))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g[..., :12]).max() > 0   # beta grads
    assert np.abs(g[..., 12:20]).max() > 0  # alpha grads
    assert np.abs(g[..., 20]).max() > 0    # gamma grads (center vertex)


def test_l_dev_positive_on_surface():
    sdf = jnp.asarray(sphere_sdf(8))
    mesh = flexicubes_dense(sdf)
    assert float(mesh.l_dev) >= 0.0 and np.isfinite(float(mesh.l_dev))


@pytest.mark.slow
def test_mesh_decoder_flexicubes_weights():
    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import SLatMeshDecoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    res = 8
    rng = np.random.default_rng(0)
    coords = np.stack(np.unravel_index(
        rng.choice(res ** 3, 10, replace=False), (res,) * 3), -1).astype(np.int32)
    feats = rng.standard_normal((10, 8)).astype(np.float32)
    x = from_lists([coords], [feats], resolution=res, capacity=16)

    dec = SLatMeshDecoder(
        resolution=res, model_channels=32, latent_channels=8, num_blocks=1,
        num_heads=4, window_size=4, use_subdivide=False,
        flexicubes_weights=True,
    )
    params = dec.init(jax.random.PRNGKey(0), x)
    sdf, deform, weights, r_out = dec.apply(params, x)
    assert sdf.shape == (1, res + 1, res + 1, res + 1)
    assert weights.shape == (1, res, res, res, 21)
    mesh = flexicubes_dense(sdf[0], deform[0], weights[0])
    assert np.isfinite(np.asarray(mesh.verts)).all()
