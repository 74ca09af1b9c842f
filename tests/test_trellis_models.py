"""TRELLIS model family tests: ss-VAE, ss-flow, SLat flow, SLat decoders,
flow-Euler samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.diffusion.flow_euler import (
    FlowEulerGuidanceIntervalSampler, FlowEulerSampler, t_schedule,
)
from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatEncoder, SLatGaussianDecoder
from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
from gvfdiffusion_tpu.models.trellis.ss_flow import (
    SparseStructureFlowModel, patchify_3d, unpatchify_3d,
)
from gvfdiffusion_tpu.models.trellis.ss_vae import (
    SparseStructureDecoder, SparseStructureEncoder, pixel_shuffle_3d,
)
from gvfdiffusion_tpu.sparse.tensor import SparseVoxels


def random_sparse(rng, b=1, l=32, c=8, res=16):
    coords = []
    for i in range(b):
        lin = np.random.default_rng(i).choice(res**3, size=l, replace=False)
        coords.append(np.stack([lin // (res * res), (lin // res) % res, lin % res], -1))
    coords = jnp.asarray(np.stack(coords), jnp.int32)
    valid = jnp.ones((b, l), bool)
    feats = jax.random.normal(rng, (b, l, c))
    return SparseVoxels(feats=feats, coords=coords, valid=valid, resolution=res)


def test_pixel_shuffle_3d():
    x = jnp.arange(2 * 2 * 2 * 16).reshape(1, 2, 2, 2, 16).astype(jnp.float32)
    y = pixel_shuffle_3d(x, 2)
    assert y.shape == (1, 4, 4, 4, 2)
    # value conservation
    np.testing.assert_allclose(np.sort(np.asarray(y).ravel()), np.sort(np.asarray(x).ravel()))


def test_patchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 4))
    t = patchify_3d(x, 2)
    assert t.shape == (2, 64, 32)
    back = unpatchify_3d(t, 2, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_ss_vae_shapes():
    enc = SparseStructureEncoder(in_channels=1, latent_channels=4,
                                 num_res_blocks=1, channels=(8, 16))
    dec = SparseStructureDecoder(out_channels=1, latent_channels=4,
                                 num_res_blocks=1, channels=(16, 8))
    x = jnp.ones((1, 8, 8, 8, 1))
    pe = enc.init(jax.random.PRNGKey(0), x)
    z, mean, logvar = enc.apply(pe, x)
    assert z.shape == (1, 4, 4, 4, 4)
    pd = dec.init(jax.random.PRNGKey(1), z)
    out = dec.apply(pd, z)
    assert out.shape == (1, 8, 8, 8, 1)


def test_ss_flow_zero_init_and_shapes():
    model = SparseStructureFlowModel(
        resolution=8, in_channels=4, model_channels=32, cond_channels=16,
        out_channels=4, num_blocks=2, num_heads=4, patch_size=2,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 4))
    t = jnp.array([100.0, 900.0])
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    params = model.init(jax.random.PRNGKey(2), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == (2, 8, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init out layer


def test_slat_flow_structure_preserved():
    model = SLatFlowModel(
        resolution=16, in_channels=8, model_channels=32, cond_channels=16,
        out_channels=8, num_blocks=1, num_heads=4, patch_size=2,
        num_io_res_blocks=2, io_block_channels=(16,),
    )
    x = random_sparse(jax.random.PRNGKey(0), l=32, c=8, res=16)
    t = jnp.array([500.0])
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16))
    params = model.init(jax.random.PRNGKey(2), x, t, cond)
    out = model.apply(params, x, t, cond)
    # output on the SAME structure as input (U-Net round trip)
    assert out.feats.shape == (1, 32, 8)
    np.testing.assert_array_equal(np.asarray(out.coords), np.asarray(x.coords))
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(x.valid))
    np.testing.assert_array_equal(np.asarray(out.feats), 0.0)  # zero-init


def test_slat_gs_decoder():
    model = SLatGaussianDecoder(
        resolution=16, model_channels=32, latent_channels=8, num_blocks=2,
        num_heads=4, window_size=4,
    )
    x = random_sparse(jax.random.PRNGKey(0), l=16, c=8, res=16)
    params = model.init(jax.random.PRNGKey(1), x)
    gs, valid = model.apply(params, x)
    assert gs._xyz.shape == (1, 16 * 8, 3)
    assert valid.shape == (1, 16 * 8)
    assert np.isfinite(np.asarray(gs._xyz)).all()


def test_slat_encoder():
    model = SLatEncoder(
        resolution=16, in_channels=8, model_channels=32, latent_channels=4,
        num_blocks=2, num_heads=4, window_size=4,
    )
    x = random_sparse(jax.random.PRNGKey(0), l=16, c=8, res=16)
    params = model.init(jax.random.PRNGKey(1), x)
    z, mean, logvar = model.apply(params, x)
    assert z.feats.shape == (1, 16, 4)


def test_t_schedule_rescale():
    ts = t_schedule(10, 1.0)
    np.testing.assert_allclose(ts, np.linspace(1, 0, 11))
    ts3 = t_schedule(10, 3.0)
    assert ts3[0] == 1.0 and ts3[-1] == 0.0
    assert ts3[5] > ts[5]  # rescale>1 shifts mass toward high noise


def test_flow_euler_recovers_target():
    # velocity oracle for delta data at x0: v = eps - x0 = (x_t - x0)/t for
    # the linear path x_t = (1-t) x0 + t eps (sigma_min = 0)
    x0 = jnp.full((1, 8), 0.6)

    def model(x_t, t_input, cond):
        t = t_input[0] / 1000.0
        return jnp.where(t > 0, (x_t - x0) / jnp.maximum(t, 1e-6), 0.0)

    sampler = FlowEulerSampler(sigma_min=0.0)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
    out = sampler.sample(model, noise, steps=50)
    np.testing.assert_allclose(np.asarray(out["samples"]), 0.6, atol=1e-2)


def test_flow_euler_cfg_interval_batched_matches_sequential():
    """Batched CFG (one 2B model call) must equal the two-call form, and the
    lax.cond interval skip must preserve the outside-interval behavior."""

    def model(x_t, t_input, cond):
        # velocity depends on both state and conditioning, batch-generic
        return 0.3 * x_t + cond

    cond = jnp.full((1, 4), 1.0)
    neg = jnp.full((1, 4), -0.5)
    noise = jnp.asarray([[0.1, -0.2, 0.3, -0.4]])
    sampler = FlowEulerGuidanceIntervalSampler()
    kw = dict(steps=6, cfg_strength=2.0, cfg_interval=(0.2, 0.8))
    out_b = sampler.sample(model, noise, cond, neg, cfg_batched=True, **kw)
    out_s = sampler.sample(model, noise, cond, neg, cfg_batched=False, **kw)
    np.testing.assert_allclose(
        np.asarray(out_b["samples"]), np.asarray(out_s["samples"]), atol=1e-6
    )

    # interval matters: full-interval CFG differs from (0.2, 0.8)
    out_full = sampler.sample(
        model, noise, cond, neg, steps=6, cfg_strength=2.0,
        cfg_interval=(0.0, 1.0),
    )
    assert not np.allclose(
        np.asarray(out_full["samples"]), np.asarray(out_b["samples"])
    )
