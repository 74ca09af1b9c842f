"""Native C++ host library vs jnp implementations — exact parity
(the reference's vox2seq/test.py strategy: native vs framework, torch.equal)."""

import numpy as np
import pytest

from gvfdiffusion_tpu import native
from gvfdiffusion_tpu.ops import curves


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native library not built")
    return lib


def test_native_builds(lib):
    assert lib is not None


def test_z_order_parity(lib):
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 1024, (4096, 3)).astype(np.int32)
    got = native.z_order_encode(coords)
    import jax.numpy as jnp

    expect = np.asarray(
        curves.z_order_encode(coords[:, 0], coords[:, 1], coords[:, 2])
    )
    np.testing.assert_array_equal(got, expect)


def test_hilbert_parity_and_roundtrip(lib):
    rng = np.random.default_rng(1)
    coords = rng.integers(0, 1024, (4096, 3)).astype(np.int32)
    got = native.hilbert_encode(coords)
    expect = np.asarray(
        curves.hilbert_encode(coords[:, 0], coords[:, 1], coords[:, 2])
    )
    np.testing.assert_array_equal(got, expect)
    back = native.hilbert_decode(got)
    np.testing.assert_array_equal(back, coords)


def test_voxel_downsample_parity(lib):
    rng = np.random.default_rng(2)
    lin = rng.choice(16**3, 500, replace=False)
    coords = np.stack([lin // 256, (lin // 16) % 16, lin % 16], -1).astype(np.int32)
    feats = rng.normal(size=(500, 8)).astype(np.float32)
    oc, of = native.voxel_downsample(coords, feats, 2, 16)
    # numpy reference
    p = coords // 2
    key = p[:, 0] * 64 + p[:, 1] * 8 + p[:, 2]
    uniq = np.unique(key)
    assert len(oc) == len(uniq)
    # check one parent's mean
    k0 = uniq[0]
    members = key == k0
    expect = feats[members].mean(0)
    got_row = of[
        (oc[:, 0] * 64 + oc[:, 1] * 8 + oc[:, 2]) == k0
    ][0]
    np.testing.assert_allclose(got_row, expect, rtol=1e-5)


def test_fps_parity(lib):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(512, 3)).astype(np.float32)
    got = native.fps(pts, 32)
    # numpy reference
    idxs = [0]
    min_d2 = np.full(512, np.inf)
    for _ in range(31):
        d2 = np.sum((pts - pts[idxs[-1]]) ** 2, -1)
        min_d2 = np.minimum(min_d2, d2)
        idxs.append(int(np.argmax(min_d2)))
    np.testing.assert_array_equal(got, np.asarray(idxs))
