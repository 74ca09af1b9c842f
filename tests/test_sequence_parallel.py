"""Sequence-parallel motion-VAE decode == single-device decode (8-dev mesh)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs
from gvfdiffusion_tpu.parallel.mesh import make_mesh
from gvfdiffusion_tpu.parallel.sequence_parallel import decode_sequence_parallel

pytestmark = pytest.mark.slow


def test_sp_decode_matches_single_device():
    assert jax.device_count() >= 8
    rng = jax.random.PRNGKey(0)
    B, T, G, N_lat, C_lat = 1, 2, 37, 8, 4  # G deliberately not divisible by 8

    vae = MotionVAE(depth=1, dim=48, queries_dim=48, output_dim=14,
                    num_inputs=G, num_latents=N_lat, latent_dim=C_lat,
                    heads=4, knn_k=4)
    gs = np.random.default_rng(0).normal(size=(G, 14)).astype(np.float32)
    queries, valid = pad_static_gs([gs])
    inputs = dict(
        static_gs=queries, gs_valid=valid, static_pc=queries[..., :3],
        delta_pc=jax.random.normal(rng, (B, T, G, 3)) * 0.05, rng=rng,
    )
    params = vae.init(rng, **inputs)
    params = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(1), x.shape) * 0.05, params
    )
    latent = jax.random.normal(rng, (B * T, N_lat, C_lat))

    ref = vae.apply(params, latent, queries, T, method=MotionVAE.decode)

    mesh = make_mesh(8, axes=("seq",))
    out = decode_sequence_parallel(vae, params, latent, queries, T, mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
