"""Mesh stack tests: marching tets on analytic SDFs, mesh renderer, SLat
mesh decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.ops.marching_tets import (
    face_normals, marching_tets_dense, weld_mesh,
)
from gvfdiffusion_tpu.render.mesh_renderer import render_mesh
from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics


def sphere_sdf(r_grid, center, radius):
    g = np.arange(r_grid + 1) / r_grid
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (
        np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2)
        - radius
    ).astype(np.float32)


def test_marching_tets_sphere():
    sdf = jnp.asarray(sphere_sdf(16, (0.5, 0.5, 0.5), 0.3))
    verts, faces, valid = marching_tets_dense(sdf)
    assert int(valid.sum()) > 100  # plenty of surface triangles
    # all surface vertices lie near the sphere
    v = np.asarray(verts)[np.asarray(faces[np.asarray(valid)]).reshape(-1)]
    d = np.linalg.norm(v - 0.5, axis=-1)
    np.testing.assert_allclose(d, 0.3, atol=0.05)


def test_marching_tets_empty_and_full():
    sdf_pos = jnp.ones((9, 9, 9))
    _, _, valid = marching_tets_dense(sdf_pos)
    assert int(valid.sum()) == 0
    sdf_neg = -jnp.ones((9, 9, 9))
    _, _, valid = marching_tets_dense(sdf_neg)
    assert int(valid.sum()) == 0


def test_marching_tets_differentiable():
    def loss(offset):
        sdf = jnp.asarray(sphere_sdf(8, (0.5, 0.5, 0.5), 0.3)) + offset
        verts, faces, valid = marching_tets_dense(sdf)
        # mean distance of face vertices from center
        pts = verts[faces.reshape(-1)]
        w = valid.repeat(3).astype(jnp.float32)
        d = jnp.linalg.norm(pts - 0.5, axis=-1)
        return jnp.sum(d * w) / jnp.maximum(w.sum(), 1.0)

    g = jax.grad(loss)(jnp.float32(0.0))
    # growing the SDF shrinks the sphere -> negative gradient of radius
    assert np.isfinite(float(g))
    assert float(g) < 0


def test_weld_mesh():
    sdf = jnp.asarray(sphere_sdf(8, (0.5, 0.5, 0.5), 0.3))
    verts, faces, valid = marching_tets_dense(sdf)
    v, f = weld_mesh(np.asarray(verts), np.asarray(faces), np.asarray(valid))
    assert len(v) < 3 * int(valid.sum())  # welding merged vertices
    assert f.max() < len(v)


def test_mesh_renderer_sphere():
    sdf = jnp.asarray(sphere_sdf(12, (0.5, 0.5, 0.5), 0.3))
    verts, faces, valid = marching_tets_dense(sdf)
    verts = verts - 0.5  # center at origin
    cam = Camera(
        world_view=jnp.asarray(lookat_extrinsics([0.0, -1.5, 0.0])),
        intrinsics=jnp.asarray(fov_intrinsics(45.0)),
        height=32, width=32, near=0.1, far=10.0,
    )
    out = render_mesh(verts, faces, valid, cam, chunk=1024)
    mask = np.asarray(out["mask"])
    assert mask.shape == (32, 32)
    assert mask[16, 16] == 1.0  # sphere covers center
    assert mask[0, 0] == 0.0    # corner empty
    # depth at center ~ 1.5 - 0.3 = 1.2
    np.testing.assert_allclose(np.asarray(out["depth"])[16, 16], 1.2, atol=0.1)
    n = np.asarray(out["normal"])[16, 16]
    assert np.linalg.norm(n) > 0.9  # unit-ish normal at hit


def test_slat_mesh_decoder_shapes():
    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import SLatMeshDecoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    sv = from_lists(
        [np.array([[2, 2, 2], [3, 3, 3]])],
        [np.zeros((2, 8), np.float32)], resolution=8, capacity=8,
    )
    model = SLatMeshDecoder(
        resolution=8, model_channels=32, latent_channels=8, num_blocks=1,
        num_heads=4, window_size=4, use_subdivide=True,
    )
    params = model.init(jax.random.PRNGKey(0), sv)
    sdf, deform, res = model.apply(params, sv)
    assert res == 16  # subdivided
    assert sdf.shape == (1, 17, 17, 17)
    assert deform.shape == (1, 17, 17, 17, 3)
    assert np.isfinite(np.asarray(sdf)).all()


def test_flexicubes_alpha_slides_vertices_not_topology():
    """alpha=1 reproduces plain MT exactly; non-uniform positive alpha moves
    crossing points along their edges without changing which faces exist
    (FlexiCubes' learned interpolation weights, ref flexicubes.py)."""
    import jax

    r = 6
    g = (np.arange(r + 1)) / r
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sdf = jnp.asarray(
        np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - 0.3,
        jnp.float32,
    )
    v0, f0, m0 = marching_tets_dense(sdf)
    v1, f1, m1 = marching_tets_dense(sdf, alpha=jnp.ones_like(sdf))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=0)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))

    rng = np.random.default_rng(0)
    alpha = jnp.asarray(
        np.exp(rng.uniform(-0.5, 0.5, sdf.shape)), jnp.float32)
    v2, _, m2 = marching_tets_dense(sdf, alpha=alpha)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m2))  # topology
    moved = np.abs(np.asarray(v2) - np.asarray(v0)).max()
    assert moved > 1e-3  # vertices actually slid

    # differentiable w.r.t. alpha
    def loss(a):
        v, _, m = marching_tets_dense(sdf, alpha=a)
        return jnp.sum(v**2)

    ga = np.asarray(jax.grad(loss)(alpha))
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def test_mesh_decoder_flexi_weights_head():
    import jax

    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import SLatMeshDecoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    slat = from_lists(
        [np.array([[2, 2, 2], [3, 2, 2]])],
        [np.random.default_rng(0).normal(size=(2, 4)).astype(np.float32)],
        resolution=8, capacity=8,
    )
    dec = SLatMeshDecoder(resolution=8, model_channels=16, latent_channels=4,
                          num_blocks=1, num_heads=2, window_size=4,
                          use_subdivide=False, use_flexi_weights=True)
    params = dec.init(jax.random.PRNGKey(0), slat)
    sdf, deform, alpha, res = dec.apply(params, slat)
    assert sdf.shape == (1, 9, 9, 9) and alpha.shape == (1, 9, 9, 9)
    a = np.asarray(alpha)
    assert (a > 0).all()
    # zero-init head -> alpha exactly 1 everywhere at init
    np.testing.assert_allclose(a, 1.0, atol=1e-6)
    verts, faces, valid = marching_tets_dense(sdf[0], deform[0], alpha=alpha[0])
    assert np.isfinite(np.asarray(verts)).all()


def test_slat_mesh_decoder_ref_and_features_to_mesh():
    """SLatMeshDecoderRef end-to-end smoke: latent sparse voxels -> 53-channel
    FlexiCubes field at 4x resolution -> sparse_features_to_mesh extracts a
    closed surface when the SDF says 'solid blob'."""
    import numpy as np

    from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import (
        MESH_FEATS_CHANNELS,
        SLatMeshDecoderRef,
        sparse_features_to_mesh,
    )
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels, from_lists

    coords = np.asarray([[1, 1, 1], [1, 1, 2], [2, 1, 1]], np.int32)
    feats = np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32)
    x = from_lists([coords], [feats], resolution=4, capacity=3)

    model = SLatMeshDecoderRef(
        resolution=4, model_channels=256, latent_channels=4, num_blocks=1,
        num_heads=4, attn_mode="full",
    )
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.resolution == 16
    assert out.feats.shape == (1, 3 * 64, MESH_FEATS_CHANNELS)
    # zero-init head -> all features 0 -> sdf = -1/res everywhere occupied
    # (inside) and +1 outside: the occupied cluster meshes as a closed blob
    meshes = sparse_features_to_mesh(out)
    mesh = meshes[0]
    assert bool(jnp.any(mesh.face_valid))
    v = mesh.verts[np.asarray(mesh.faces[np.asarray(mesh.face_valid)])]
    assert np.all(np.abs(np.asarray(v)) <= 0.5 + 1e-6)
