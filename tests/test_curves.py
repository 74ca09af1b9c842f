"""Parity tests for space-filling curves.

Mirrors the reference's kernel-parity strategy (vox2seq/test.py: CUDA vs
pure-PyTorch, exact equality) — here: jnp implementation vs independent numpy
bit math, plus the defining geometric properties of the curves.
"""

import numpy as np
import jax.numpy as jnp

from gvfdiffusion_tpu.ops import curves


def _np_interleave(x, y, z):
    """Independent straightforward numpy Morton reference (bit loop)."""
    code = np.zeros_like(x, dtype=np.int64)
    for b in range(10):
        code |= ((x >> b) & 1) << (3 * b)
        code |= ((y >> b) & 1) << (3 * b + 1)
        code |= ((z >> b) & 1) << (3 * b + 2)
    return code


def test_z_order_matches_numpy():
    rng = np.random.default_rng(0)
    x, y, z = rng.integers(0, 1024, size=(3, 4096)).astype(np.int32)
    got = np.asarray(curves.z_order_encode(jnp.array(x), jnp.array(y), jnp.array(z)))
    np.testing.assert_array_equal(got.astype(np.int64), _np_interleave(x, y, z))


def test_z_order_roundtrip():
    rng = np.random.default_rng(1)
    x, y, z = rng.integers(0, 1024, size=(3, 4096)).astype(np.int32)
    code = curves.z_order_encode(jnp.array(x), jnp.array(y), jnp.array(z))
    dx, dy, dz = curves.z_order_decode(code)
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(dz), z)


def test_hilbert_roundtrip_full_grid():
    # Exhaustive at bits=5 (32^3 cells), mirroring vox2seq/test.py's grid sweep.
    n = 32
    g = np.arange(n, dtype=np.int32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    x, y, z = x.ravel(), y.ravel(), z.ravel()
    code = curves.hilbert_encode(jnp.array(x), jnp.array(y), jnp.array(z), bits=5)
    dx, dy, dz = curves.hilbert_decode(code, bits=5)
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(dz), z)


def test_hilbert_is_a_hilbert_curve():
    # Defining property: decode(0..N-1) visits every cell exactly once and
    # consecutive indices are grid neighbors (L1 distance exactly 1).
    bits = 4
    n_cells = (1 << bits) ** 3
    idx = jnp.arange(n_cells, dtype=jnp.int32)
    x, y, z = curves.hilbert_decode(idx, bits=bits)
    pts = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], axis=-1)
    # bijection
    flat = pts[:, 0] * 256 + pts[:, 1] * 16 + pts[:, 2]
    assert len(np.unique(flat)) == n_cells
    # adjacency
    d = np.abs(np.diff(pts.astype(np.int64), axis=0)).sum(axis=1)
    assert (d == 1).all()


def test_hilbert_roundtrip_random_10bit():
    rng = np.random.default_rng(2)
    x, y, z = rng.integers(0, 1024, size=(3, 8192)).astype(np.int32)
    code = curves.hilbert_encode(jnp.array(x), jnp.array(y), jnp.array(z))
    dx, dy, dz = curves.hilbert_decode(code)
    np.testing.assert_array_equal(np.asarray(dx), x)
    np.testing.assert_array_equal(np.asarray(dy), y)
    np.testing.assert_array_equal(np.asarray(dz), z)


def test_encode_decode_permutations():
    rng = np.random.default_rng(3)
    coords = jnp.array(rng.integers(0, 1024, size=(512, 3)).astype(np.int32))
    for mode in ("z_order", "hilbert"):
        for perm in ((0, 1, 2), (2, 0, 1), (1, 2, 0)):
            code = curves.encode(coords, mode=mode, permute=perm)
            back = curves.decode(code, mode=mode, permute=perm)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))
