"""Octree + Strivec representation tests."""

import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.representations.octree import (
    DfsOctree, Strivec, from_sparse_voxels, prune, subdivide,
)
from gvfdiffusion_tpu.sparse.tensor import from_lists


def make_tree():
    sv = from_lists(
        [np.array([[1, 1, 1], [2, 2, 2]])],
        [np.ones((2, 4), np.float32)], resolution=4, capacity=4,
    )
    return from_sparse_voxels(sv)


def test_from_sparse_voxels():
    t = make_tree()
    assert int(t.count()) == 2
    assert int(t.depths[0]) == 2  # log2(4)
    np.testing.assert_allclose(
        np.asarray(t.positions[0]), (np.array([1, 1, 1]) + 0.5) / 4
    )
    np.testing.assert_allclose(float(t.cell_size()[0]), 0.25)


def test_subdivide_and_prune():
    t = make_tree()
    mask = jnp.array([True, False, False, False])
    t2 = subdivide(t, mask)
    assert t2.capacity == 32
    # leaf 0 split into 8 children at depth 3, leaf 1 kept at depth 2
    assert int(t2.count()) == 8 + 1
    assert int(t2.depths[0]) == 3
    # children positions inside the parent cell
    kids = np.asarray(t2.positions[:8])
    assert (np.abs(kids - np.asarray(t.positions[0])) <= 0.126).all()
    t3 = prune(t2, t2.valid & (jnp.arange(32) < 4))
    assert int(t3.count()) == 9 - 4


def test_strivec_density():
    t = make_tree()
    rank, dim = 2, 4
    tv = jnp.ones((4, rank, 3, dim))
    dens = jnp.ones((4, rank))
    colors = jnp.ones((4, rank, 3))
    s = Strivec(tree=t, trivec=tv, density=dens, colors=colors)
    # point inside leaf 0 -> density = sum over rank of 1*1*1 = 2
    p_in = t.positions[0:1]
    d = s.density_at(p_in)
    np.testing.assert_allclose(np.asarray(d), 2.0)
    # point in empty space -> 0
    p_out = jnp.array([[0.95, 0.95, 0.05]])
    np.testing.assert_allclose(np.asarray(s.density_at(p_out)), 0.0)
