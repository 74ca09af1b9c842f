"""Static VAE + SparseVAE framework tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.sparse_vae import (
    GSConfig, build_perturbation, hammersley_sequence, kl_loss,
    regularization_losses, to_representation,
)
from gvfdiffusion_tpu.models.static_vae import SparseTransformerVAE, block_attn_config
from gvfdiffusion_tpu.sparse.tensor import SparseVoxels, from_lists


def random_sparse(rng, b=2, l=32, c=16, res=16):
    coords = []
    for i in range(b):
        lin = np.random.default_rng(i).choice(res**3, size=l, replace=False)
        coords.append(np.stack([lin // (res * res), (lin // res) % res, lin % res], -1))
    coords = jnp.asarray(np.stack(coords), jnp.int32)
    valid = jnp.arange(l)[None, :] < jnp.asarray([l - 4, l])[:b, None]
    feats = jax.random.normal(rng, (b, l, c)) * valid[..., None]
    return SparseVoxels(feats=feats, coords=coords, valid=valid, resolution=res)


def test_block_attn_config_swin_alternates():
    cfg = list(block_attn_config("swin", 8, 4))
    assert cfg[0][3] == (0, 0, 0)
    assert cfg[1][3] == (4, 4, 4)
    assert cfg[2][3] == (0, 0, 0)
    assert all(c[0] == "windowed" for c in cfg)


def test_static_vae_roundtrip_shapes():
    model = SparseTransformerVAE(
        resolution=16, in_channels=16, model_channels=32, out_channels=28,
        latent_channels=4, num_blocks=2, window_size=4, num_heads=4,
    )
    x = random_sparse(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    out, mean, logvar = model.apply(params, x, jax.random.PRNGKey(2))
    assert out.feats.shape == (2, 32, 28)
    assert mean.shape == (2, 32, 4)
    # to_latent zero-init -> posterior mean/logvar all zero at init
    np.testing.assert_array_equal(np.asarray(mean), 0.0)
    np.testing.assert_array_equal(np.asarray(logvar), 0.0)
    # out_layer zero-init -> output zero at init
    np.testing.assert_array_equal(np.asarray(out.feats), 0.0)


def test_static_vae_encode_decode_methods():
    model = SparseTransformerVAE(
        resolution=16, in_channels=16, model_channels=32, out_channels=28,
        latent_channels=4, num_blocks=2, window_size=4, num_heads=4,
    )
    x = random_sparse(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))
    z, mean, logvar = model.apply(
        params, x, method=SparseTransformerVAE.encode
    )
    assert z.feats.shape == (2, 32, 4)
    out = model.apply(params, z, method=SparseTransformerVAE.decode)
    assert out.feats.shape == (2, 32, 28)


def test_hammersley_and_perturbation():
    seq = [hammersley_sequence(3, i, 8) for i in range(8)]
    arr = np.asarray(seq)
    assert arr.shape == (8, 3)
    assert (arr >= 0).all() and (arr < 1).all()
    p = build_perturbation(GSConfig())
    assert p.shape == (8, 3)
    assert np.isfinite(p).all()


def test_to_representation_layout():
    cfg = GSConfig()
    res = 16
    x = from_lists(
        [np.array([[4, 4, 4]])],
        [np.zeros((1, cfg.out_channels), np.float32)],
        resolution=res,
    )
    gs, valid = to_representation(x, cfg)
    assert gs._xyz.shape == (1, 8, 3)
    assert valid.shape == (1, 8)
    assert bool(valid.all())
    # zero offsets -> gaussians near the voxel center (within half voxel_size)
    center = (4 + 0.5) / res
    xyz = np.asarray(gs._xyz[0])
    assert np.abs(xyz - center).max() <= 0.5 * cfg.voxel_size / res + 1e-6
    # perturbation spreads the 8 gaussians to distinct positions
    assert len(np.unique(xyz.round(6), axis=0)) == 8


def test_regularization_and_kl():
    cfg = GSConfig()
    feats = np.random.default_rng(0).normal(size=(1, 4, cfg.out_channels)).astype(np.float32)
    sv = SparseVoxels(
        feats=jnp.asarray(feats),
        coords=jnp.zeros((1, 4, 3), jnp.int32),
        valid=jnp.ones((1, 4), bool),
        resolution=16,
    )
    gs, valid = to_representation(sv, cfg)
    reg = regularization_losses(gs, valid)
    assert float(reg["reg_vol"]) > 0
    assert 0 <= float(reg["reg_opacity"]) <= 1
    kl = kl_loss(jnp.zeros((1, 4, 8)), jnp.zeros((1, 4, 8)), jnp.ones((1, 4), bool))
    assert float(kl) == 0.0


def test_render_from_representation():
    """End-to-end: sparse feats -> gaussians -> render produces an image."""
    from gvfdiffusion_tpu.render import reference_renderer as rr
    from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics

    cfg = GSConfig()
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 8, cfg.out_channels)).astype(np.float32) * 0.1
    coords = np.stack(np.meshgrid([7, 8], [7, 8], [7, 8], indexing="ij"), -1).reshape(-1, 3)
    sv = SparseVoxels(
        feats=jnp.asarray(feats),
        coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, 8), bool),
        resolution=16,
    )
    gs, valid = to_representation(sv, cfg)
    gs_one = jax.tree.map(lambda a: a[0] if a.ndim > 1 else a, gs)
    cam = Camera(
        world_view=jnp.asarray(lookat_extrinsics([0, -1.2, 0])),
        intrinsics=jnp.asarray(fov_intrinsics(45.0)),
        height=24, width=24,
    )
    out = rr.render(gs_one, cam, valid=valid[0], mip=True, kernel_size_2d=cfg.filter_2d_kernel_size)
    img = np.asarray(out["render"])
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert np.asarray(out["alpha"]).max() > 0.01  # something rendered
