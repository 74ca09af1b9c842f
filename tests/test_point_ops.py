"""Tests for FPS + KNN ops vs brute-force numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.ops import fps as fps_mod
from gvfdiffusion_tpu.ops import knn as knn_mod


def np_fps(points, k, start=0):
    n = points.shape[0]
    idxs = [start]
    min_d2 = np.full(n, np.inf)
    for _ in range(k - 1):
        d2 = np.sum((points - points[idxs[-1]]) ** 2, axis=-1)
        min_d2 = np.minimum(min_d2, d2)
        idxs.append(int(np.argmax(min_d2)))
    return np.array(idxs)


def test_fps_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(256, 3)).astype(np.float32)
    got = np.asarray(fps_mod.fps(jnp.array(pts), 32))
    np.testing.assert_array_equal(got, np_fps(pts, 32))


def test_fps_spread_property():
    # FPS points should be more spread out than random points
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(2048, 3)).astype(np.float32)
    idx = np.asarray(fps_mod.fps(jnp.array(pts), 64))
    sel = pts[idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    min_fps = d.min()
    rnd = pts[rng.choice(2048, 64, replace=False)]
    d2 = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
    np.fill_diagonal(d2, np.inf)
    assert min_fps > d2.min()


def test_fps_masked_never_selects_padding():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    pts[100:] = 100.0  # far-away padding that plain FPS would love
    valid = np.arange(128) < 100
    idx = np.asarray(fps_mod.fps_masked(jnp.array(pts), jnp.array(valid), 32))
    assert (idx < 100).all()
    assert len(np.unique(idx)) == 32


def test_knn_matches_numpy():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 16, 3)).astype(np.float32)
    p = rng.normal(size=(2, 64, 3)).astype(np.float32)
    d2, idx = knn_mod.knn_points(jnp.array(q), jnp.array(p), 4)
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(2):
        full = ((q[b][:, None] - p[b][None]) ** 2).sum(-1)
        expect_idx = np.argsort(full, axis=1)[:, :4]
        expect_d2 = np.take_along_axis(full, expect_idx, axis=1)
        np.testing.assert_allclose(np.sort(d2[b], axis=1), np.sort(expect_d2, 1), atol=1e-4)
        # indices agree as sets per row
        for r in range(16):
            assert set(idx[b, r]) == set(expect_idx[r])


def test_interpolate_deltas_rigid_translation():
    # if every point moves by the same vector, interpolation must return it
    rng = np.random.default_rng(4)
    pc = rng.normal(size=(1, 128, 3)).astype(np.float32)
    anchors = pc[:, :16] + rng.normal(size=(1, 16, 3)).astype(np.float32) * 0.01
    shift = np.array([0.3, -0.2, 0.1], dtype=np.float32)
    deltas = np.broadcast_to(shift, (1, 4, 128, 3)).copy()
    out = knn_mod.interpolate_deltas(
        jnp.array(anchors), jnp.array(pc), jnp.array(deltas), k=8
    )
    np.testing.assert_allclose(np.asarray(out), np.broadcast_to(shift, (1, 4, 16, 3)), atol=1e-5)


def test_interpolate_deltas_shapes():
    rng = np.random.default_rng(5)
    anchors = jnp.array(rng.normal(size=(2, 8, 3)).astype(np.float32))
    pc = jnp.array(rng.normal(size=(2, 64, 3)).astype(np.float32))
    deltas = jnp.array(rng.normal(size=(2, 3, 64, 3)).astype(np.float32))
    out = knn_mod.interpolate_deltas(anchors, pc, deltas, k=4)
    assert out.shape == (2, 3, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
