"""Octree primitive renderers: index grid, trivec sampling, and all four
diffoctreerast-equivalent payloads (voxel/gaussian/trivec/decoupoly)."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.render.octree_renderer import (OctreeRenderer,
                                                     OctreeRenderOptions,
                                                     make_field)
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.representations.octree import (DecoupolyOctree,
                                                     DfsOctree,
                                                     GaussianOctree, Strivec,
                                                     VoxelOctree,
                                                     from_sparse_voxels,
                                                     leaf_index_grid,
                                                     lookup_leaf,
                                                     sample_trivec, subdivide)
from gvfdiffusion_tpu.sparse.tensor import from_dense


def ball_tree(res=8):
    """Uniform-depth octree of the voxels inside a centered ball."""
    g = (np.arange(res) + 0.5) / res
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    occ = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2 < 0.3**2
    n = int(occ.sum())
    sv = from_dense(jnp.asarray(occ[None, ..., None], jnp.float32), capacity=n)
    return from_sparse_voxels(sv), n


def test_leaf_index_grid_uniform():
    tree, n_occ = ball_tree(8)
    grid = np.asarray(leaf_index_grid(tree))
    assert grid.shape == (8, 8, 8)
    assert (grid >= 0).sum() == n_occ
    # every valid leaf's own cell points back at it
    pos = np.asarray(tree.positions)
    valid = np.asarray(tree.valid)
    cells = np.clip((pos * 8).astype(int), 0, 7)
    for i in np.nonzero(valid)[0][:20]:
        assert grid[tuple(cells[i])] == i


def test_leaf_index_grid_mixed_depth():
    # one depth-1 leaf covering an octant + nothing else
    tree = DfsOctree(
        positions=jnp.asarray([[0.25, 0.25, 0.25]]),
        depths=jnp.asarray([1], jnp.int32),
        features=jnp.zeros((1, 1)),
        valid=jnp.asarray([True]),
        max_depth=3,
    )
    grid = np.asarray(leaf_index_grid(tree))  # R = 8
    assert (grid[:4, :4, :4] == 0).all()
    assert (grid[4:] == -1).all() and (grid[:, 4:] == -1).all()


def test_lookup_leaf_in_out():
    tree, _ = ball_tree(8)
    grid = leaf_index_grid(tree)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.02, 0.02, 0.02]])
    leaf, rel = lookup_leaf(grid, pts)
    leaf = np.asarray(leaf)
    assert leaf[0] >= 0       # center is occupied
    assert leaf[1] == -1      # outside the cube
    assert leaf[2] == -1      # corner cell is empty
    assert np.all((np.asarray(rel) >= 0) & (np.asarray(rel) <= 1.0 + 1e-6))


def test_sample_trivec_linear_interp():
    rng = np.random.default_rng(0)
    tv = jnp.asarray(rng.standard_normal((5, 2, 3, 4)), jnp.float32)
    rel = jnp.asarray(rng.uniform(0, 1, (5, 3)), jnp.float32)
    got = np.asarray(sample_trivec(tv, rel))
    tvn, reln = np.asarray(tv), np.asarray(rel)
    expect = np.ones((5, 2))
    for ax in range(3):
        pos = reln[:, ax] * 3  # dim-1
        i0 = np.clip(np.floor(pos).astype(int), 0, 2)
        w = pos - i0
        v = (tvn[np.arange(5), :, ax, i0] * (1 - w[:, None])
             + tvn[np.arange(5), :, ax, i0 + 1] * w[:, None])
        expect *= v
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def _cam():
    return orbit_camera(30.0, 20.0, radius=1.6, height=32, width=32,
                        target=(0.5, 0.5, 0.5))


def _render(payload, **opt):
    r = OctreeRenderer(OctreeRenderOptions(num_steps=96, **opt))
    return jax.jit(lambda: r.render(payload, _cam()))()


def test_voxel_octree_render():
    tree, _ = ball_tree(8)
    n = tree.capacity
    oct = VoxelOctree(
        tree=tree,
        density=jnp.full((n,), 6.0),  # exp(6-2) ~ 55: optically thick
        colors_dc=jnp.tile(jnp.asarray([[2.0, 0.0, -2.0]]), (n, 1)),
    )
    out = _render(oct)
    assert set(out) == {"color", "depth", "alpha"}
    a = np.asarray(out["alpha"])
    assert np.isfinite(np.asarray(out["color"])).all()
    assert a[16, 16] > 0.9       # thick ball saturates in the middle
    assert a[0, 0] < 0.05        # empty corner
    c = np.asarray(out["color"])[16, 16]
    assert c[0] > 0.8 and c[2] < 0.2  # dc red>0, blue<0 via C0*dc+0.5
    d = np.asarray(out["depth"])[16, 16]
    assert 0.8 < d < 1.6 and np.asarray(out["depth"])[0, 0] == 0


def test_voxel_octree_solid():
    tree, _ = ball_tree(8)
    n = tree.capacity
    oct = VoxelOctree(
        tree=tree, density=jnp.full((n,), -100.0),
        colors_dc=jnp.zeros((n, 3)), solid=True,
    )
    out = _render(oct)
    assert np.asarray(out["alpha"])[16, 16] > 0.99  # density ignored: solid


def test_gaussian_octree_render():
    tree, _ = ball_tree(8)
    n = tree.capacity
    oct = GaussianOctree(
        tree=tree, opacity=jnp.full((n,), 10.0),  # sigmoid(10-6) ~ 0.98
        colors_dc=jnp.zeros((n, 3)),
    )
    out = _render(oct)
    a = np.asarray(out["alpha"])
    assert a[16, 16] > 0.5 and a[0, 0] < 0.05
    assert np.isfinite(np.asarray(out["color"])).all()


def test_strivec_render_and_percent_depth():
    tree, _ = ball_tree(8)
    n = tree.capacity
    rank, dim = 4, 8
    rng = np.random.default_rng(1)
    oct = Strivec(
        tree=tree,
        trivec=jnp.asarray(rng.uniform(0.5, 1.5, (n, rank, 3, dim)), jnp.float32),
        density=jnp.full((n, rank), 2.0),
        colors=jnp.asarray(rng.uniform(0, 1, (n, rank, 3)), jnp.float32),
    )
    out = _render(oct)
    assert "percent_depth" in out
    a = np.asarray(out["alpha"])
    assert a[16, 16] > 0.5 and a[0, 0] < 0.05
    pd = np.asarray(out["percent_depth"])[16, 16]
    assert 0.8 <= pd <= 1.6  # median-transmittance depth inside [near, far]


def test_strivec_used_rank_subset():
    tree, _ = ball_tree(4)
    n = tree.capacity
    tv = jnp.ones((n, 4, 3, 4))
    oct_full = Strivec(tree=tree, trivec=tv,
                       density=jnp.concatenate(
                           [jnp.ones((n, 2)), jnp.zeros((n, 2))], -1),
                       colors=jnp.full((n, 4, 3), 0.5))
    out_full = _render(oct_full)
    out_r2 = _render(oct_full, used_rank=2)
    np.testing.assert_allclose(np.asarray(out_full["alpha"]),
                               np.asarray(out_r2["alpha"]), atol=1e-5)


def test_decoupoly_render_matches_manual_poly():
    tree, _ = ball_tree(8)
    n = tree.capacity
    rank, degree = 3, 4
    rng = np.random.default_rng(2)
    V = rng.standard_normal((n, rank, 3)).astype(np.float32)
    g = rng.uniform(0.1, 0.5, (n, rank, degree)).astype(np.float32)
    oct = DecoupolyOctree(
        tree=tree, V=jnp.asarray(V), g=jnp.asarray(g),
        density=jnp.full((n, rank), 3.0),
        colors=jnp.asarray(rng.uniform(0, 1, (n, rank, 3)), jnp.float32),
    )
    out = _render(oct)
    a = np.asarray(out["alpha"])
    assert np.isfinite(a).all() and a[16, 16] > 0.3 and a[0, 0] < 0.05

    # field-level check: sigma at a known interior point equals manual Horner
    field = make_field(oct)
    p = jnp.asarray([[0.5, 0.5, 0.5]])
    sigma, _ = field(p, jnp.asarray([[0.0, 0.0, 1.0]]))
    grid = leaf_index_grid(tree)
    leaf, rel = lookup_leaf(grid, p)
    i = int(np.asarray(leaf)[0])
    local = np.asarray(rel)[0] * 2 - 1
    vn = V[i] / (np.linalg.norm(V[i], axis=-1, keepdims=True) + 1e-8)
    t = vn @ local
    poly = sum(g[i][:, d] * t**d for d in range(degree))
    expect = max(np.sum(np.exp(3.0 - 2.0) * np.maximum(poly, 0.0)), 0.0) * 8
    np.testing.assert_allclose(float(sigma[0]), expect, rtol=1e-4)


def test_colors_overwrite():
    tree, _ = ball_tree(8)
    n = tree.capacity
    oct = VoxelOctree(tree=tree, density=jnp.full((n,), 6.0),
                      colors_dc=jnp.zeros((n, 3)))
    ow = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    r = OctreeRenderer(OctreeRenderOptions(num_steps=96))
    out = r.render(oct, _cam(), colors_overwrite=ow)
    c = np.asarray(out["color"])[16, 16]
    assert c[1] > 0.9 and c[0] < 0.05 and c[2] < 0.05


def test_subdivided_tree_renders():
    tree, _ = ball_tree(4)
    mask = tree.valid  # subdivide every valid leaf
    fine = subdivide(tree, mask)
    n = fine.capacity
    oct = VoxelOctree(tree=fine, density=jnp.full((n,), 6.0),
                      colors_dc=jnp.zeros((n, 3)))
    out = _render(oct)
    a = np.asarray(out["alpha"])
    assert a[16, 16] > 0.9 and a[0, 0] < 0.05


def test_sample_trivec_taps_matches_full_gather():
    """The tap-gather evaluator must equal sample_trivec on gathered leaves."""
    from gvfdiffusion_tpu.representations.octree import sample_trivec_taps

    rng = np.random.default_rng(3)
    n, rank, dim, p = 7, 3, 5, 11
    tv = jnp.asarray(rng.standard_normal((n, rank, 3, dim)), jnp.float32)
    leaf = jnp.asarray(rng.integers(0, n, (p,)), jnp.int32)
    rel = jnp.asarray(rng.uniform(0, 1, (p, 3)), jnp.float32)
    full = sample_trivec(tv[leaf], rel)
    taps = sample_trivec_taps(tv, leaf, rel)
    np.testing.assert_allclose(np.asarray(taps), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_lookup_leaf_local_coarse_leaf():
    """Leaf-local coords span a COARSE leaf's whole cell once (not tiled per
    finest cell — ADVICE r2), and the returned resolution is the leaf's own
    2^depth."""
    from gvfdiffusion_tpu.representations.octree import (leaf_index_grid,
                                                         lookup_leaf_local)

    # one depth-1 leaf on the low octant of a max_depth=3 tree
    tree = DfsOctree(
        positions=jnp.asarray([[0.25, 0.25, 0.25]]),
        depths=jnp.asarray([1], jnp.int32),
        features=jnp.zeros((1, 1)),
        valid=jnp.asarray([True]),
        max_depth=3,
    )
    grid = leaf_index_grid(tree)
    pts = jnp.asarray([
        [0.01, 0.01, 0.01],   # near leaf corner -> rel ~ 0.02
        [0.25, 0.25, 0.25],   # leaf center -> rel = 0.5
        [0.49, 0.49, 0.49],   # near far corner -> rel ~ 0.98
    ])
    leaf, rel, res = lookup_leaf_local(grid, tree, pts)
    assert (np.asarray(leaf) == 0).all()
    np.testing.assert_allclose(np.asarray(res), 2.0)
    np.testing.assert_allclose(np.asarray(rel)[0], [0.02, 0.02, 0.02], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rel)[1], [0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rel)[2], [0.98, 0.98, 0.98], atol=1e-6)


def test_gaussian_field_coarse_leaf_single_blob():
    """On a mixed-depth tree the gaussian payload must evaluate as ONE blob
    over the coarse leaf (the old finest-cell rel tiled it 2^(dmax-d)^3
    times). The kernel must peak at the leaf center and decay monotonically
    toward the corner along the diagonal."""
    from gvfdiffusion_tpu.render.octree_renderer import make_field

    tree = DfsOctree(
        positions=jnp.asarray([[0.25, 0.25, 0.25]]),
        depths=jnp.asarray([1], jnp.int32),
        features=jnp.zeros((1, 1)),
        valid=jnp.asarray([True]),
        max_depth=3,
    )
    oct = GaussianOctree(
        tree=tree,
        opacity=jnp.asarray([6.0]),  # sigmoid(0) = 0.5
        colors_dc=jnp.asarray([[0.5, 0.5, 0.5]]),
    )
    field = make_field(oct)
    ts = np.linspace(0.02, 0.25, 12)  # corner -> leaf center on the diagonal
    pts = jnp.asarray(np.stack([ts, ts, ts], -1))
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), pts.shape)
    sigma, _ = field(pts, dirs)
    s = np.asarray(sigma)
    # strictly increasing toward the center => one blob over the whole leaf
    assert (np.diff(s) > 0).all(), s
    # peak scaled by the LEAF's resolution (2), not the finest grid's (8)
    np.testing.assert_allclose(s[-1], -np.log1p(-0.5) * 2.0, rtol=1e-3)
