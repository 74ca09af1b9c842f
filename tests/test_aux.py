"""Aux subsystem tests: PLY IO, Conv4d/AttentionPooling, debug asserts,
LPIPS structure, elastic controller, logger, config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.nn.misc import AttentionPooling, Conv4d, update_ema
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat, from_activated
from gvfdiffusion_tpu.representations.ply_io import load_ply, save_ply
from gvfdiffusion_tpu.sparse.debug import (
    SparseInvariantError, check_permutation_roundtrip, check_sparse_voxels,
)
from gvfdiffusion_tpu.sparse.tensor import SparseVoxels, from_lists


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    activated = np.concatenate(
        [
            rng.uniform(-0.3, 0.3, (20, 3)),
            rng.uniform(0.01, 0.05, (20, 3)),
            np.tile([1.0, 0, 0, 0], (20, 1)),
            rng.uniform(-1, 1, (20, 3)),
            rng.uniform(0.2, 0.9, (20, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    gs = from_activated(jnp.asarray(activated))
    path = str(tmp_path / "test.ply")
    n = save_ply(gs, path)
    assert n == 20
    back = load_ply(path)
    np.testing.assert_allclose(np.asarray(back.get_xyz), activated[:, :3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(back.get_scaling), activated[:, 3:6], rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(back.get_opacity), activated[:, 13:14], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(back.get_features)[:, 0], activated[:, 10:13], atol=1e-5
    )


def test_ply_valid_mask(tmp_path):
    activated = np.zeros((10, 14), np.float32)
    activated[:, 3:6] = 0.01
    activated[:, 6] = 1.0
    activated[:, 13] = 0.5
    gs = from_activated(jnp.asarray(activated))
    path = str(tmp_path / "mask.ply")
    n = save_ply(gs, path, valid=np.arange(10) < 7)
    assert n == 7


def test_conv4d_shapes():
    m = Conv4d(features=8)
    x = jnp.ones((1, 3, 4, 4, 4, 2))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (1, 3, 4, 4, 4, 8)


def test_attention_pooling():
    m = AttentionPooling(num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    p = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(p, x)
    assert out.shape == (2, 16)


def test_update_ema():
    ema = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    out = update_ema(ema, new, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_debug_asserts_catch_violations():
    good = from_lists([np.array([[1, 2, 3]])], [np.ones((1, 4), np.float32)], 8)
    check_sparse_voxels(good)  # no raise

    bad_coords = good.replace(coords=jnp.array([[[1, 2, 99]]], jnp.int32))
    with pytest.raises(SparseInvariantError):
        check_sparse_voxels(bad_coords)

    dup = from_lists(
        [np.array([[1, 2, 3], [1, 2, 3]])], [np.ones((2, 4), np.float32)], 8
    )
    with pytest.raises(SparseInvariantError):
        check_sparse_voxels(dup)

    pad_dirty = good.replace(
        feats=jnp.ones((1, 1, 4)),
        valid=jnp.array([[False]]),
    )
    with pytest.raises(SparseInvariantError):
        check_sparse_voxels(pad_dirty)


def test_permutation_roundtrip_check():
    order = np.array([[2, 0, 1]])
    inv = np.argsort(order, axis=-1)
    check_permutation_roundtrip(order, inv)
    with pytest.raises(SparseInvariantError):
        check_permutation_roundtrip(order, order)


def test_lpips_structure_runs():
    from gvfdiffusion_tpu.ops.lpips import LPIPS

    m = LPIPS()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(2), x, y)
    d = m.apply(p, x, y)
    assert d.shape == (1,)
    assert float(d[0]) > 0
    # identical images -> zero distance
    d0 = m.apply(p, x, x)
    np.testing.assert_allclose(np.asarray(d0), 0.0, atol=1e-6)


def test_elastic_controller_fits_linear_model():
    from gvfdiffusion_tpu.utils.elastic import LinearMemoryController

    c = LinearMemoryController(update_every=10, available_memory=1000)
    # synthetic: memory = 2 * x + 100
    c._xs = [10.0, 20.0, 50.0, 100.0]
    c._ys = [120.0, 140.0, 200.0, 300.0]
    c._fit()
    assert c.k == pytest.approx(2.0, rel=1e-6)
    assert c.b == pytest.approx(100.0, rel=1e-6)
    c.max_mem_ratio = 1.0
    # budget = 800 -> ratio = (800-100)/(2*1000) = 0.35
    assert c.get_mem_ratio(1000) == pytest.approx(0.35, rel=1e-6)


def test_logger_kv_and_profile(tmp_path):
    from gvfdiffusion_tpu.utils import logger

    logger.configure(str(tmp_path), format_strs=["json", "csv"])
    logger.logkv("a", 1.0)
    logger.logkv_mean("b", 2.0)
    logger.logkv_mean("b", 4.0)
    with logger.profile_kv("work"):
        pass
    out = logger.dumpkvs()
    assert out["a"] == 1.0
    assert out["b"] == 3.0
    assert "wait_work" in out
    assert os.path.exists(tmp_path / "progress.json")


def test_config_overrides():
    from gvfdiffusion_tpu.utils.config import Config, apply_overrides, load_config

    cfg = load_config(None, ["--train.lr=0.001", "--model.num_blocks=4",
                             "--diffusion.noise_schedule=linear"])
    assert cfg.train.lr == 0.001
    assert cfg.model.num_blocks == 4
    assert cfg.diffusion.noise_schedule == "linear"
    # nested dict overlay (YAML style)
    cfg2 = apply_overrides(Config(), {"model": {"num_heads": 8}})
    assert cfg2.model.num_heads == 8
    assert cfg2.model.num_blocks == 12  # untouched
