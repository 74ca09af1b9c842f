"""VAE-train CLI: TRELLIS-init surgery, encoder freeze, mesh-sharded steps.

Covers the reference's main_vae.py:31-47 init path — load a pretrained static
VAE state dict, drop out_layer on shape mismatch, freeze the encoder unless
--finetune_encoder — and the 8-way DP launch (README.md:77) that the CLI now
mirrors with a jax mesh.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import ref_loader
from gvfdiffusion_tpu.cli.main_vae import init_static_from_torch
from gvfdiffusion_tpu.models.static_vae import SparseTransformerVAE
from gvfdiffusion_tpu.train.train_state import freeze_subtrees, make_optimizer


def _torch_vae(out_channels, seed=7):
    stv = ref_loader.load_ref(
        "model.sparse_voxel_diffusion.sparse_transformer_vae")
    theirs = stv.SparseTransformerVAE(
        resolution=16, in_channels=8, model_channels=32,
        out_channels=out_channels, latent_channels=4, num_blocks=2,
        window_size=4, num_heads=4, num_head_channels=8, attn_mode="swin",
        norm_output=True, use_old_attn_impl=False,
    )
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in theirs.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    return theirs


def _fresh_params(out_channels):
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    mine = SparseTransformerVAE(
        resolution=16, in_channels=8, model_channels=32,
        out_channels=out_channels, latent_channels=4, num_blocks=2,
        window_size=4, num_heads=4, attn_mode="swin",
    )
    coords = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    feats = np.ones((2, 8), np.float32)
    x = from_lists([coords], [feats], resolution=16, capacity=4)
    return mine.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))


@pytest.mark.slow
def test_init_surgery_shape_mismatch(tmp_path):
    """Checkpoint out_layer 10ch vs model 14ch: out_layer stays fresh,
    encoder/decoder load from the checkpoint."""
    theirs = _torch_vae(out_channels=10)
    path = str(tmp_path / "static_vae.pt")
    torch.save({"module." + k: v for k, v in theirs.state_dict().items()}, path)

    fresh = _fresh_params(out_channels=14)
    fresh_out = np.asarray(fresh["params"]["out_layer"]["Dense_0"]["kernel"])
    loaded = init_static_from_torch(fresh, path, num_blocks=2, num_heads=4)

    got = np.asarray(loaded["params"]["out_layer"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(got, fresh_out)  # surgery kept fresh init
    want_enc = theirs.state_dict()["encoder.0.mlp.mlp.0.weight"].numpy().T
    got_enc = np.asarray(
        loaded["params"]["enc_0"]["mlp"]["mlp_0"]["Dense_0"]["kernel"])
    np.testing.assert_allclose(got_enc, want_enc, rtol=1e-6)


@pytest.mark.slow
def test_init_no_surgery_when_shapes_match(tmp_path):
    theirs = _torch_vae(out_channels=14)
    path = str(tmp_path / "static_vae.pt")
    torch.save(theirs.state_dict(), path)

    loaded = init_static_from_torch(
        _fresh_params(out_channels=14), path, num_blocks=2, num_heads=4)
    got = np.asarray(loaded["params"]["out_layer"]["Dense_0"]["kernel"])
    want = theirs.state_dict()["out_layer.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_freeze_subtrees_zeroes_encoder_updates():
    params = {"params": {
        "enc_0": {"Dense_0": {"kernel": jnp.ones((3, 3))}},
        "dec_0": {"Dense_0": {"kernel": jnp.ones((3, 3))}},
    }}
    tx = freeze_subtrees(make_optimizer(lr=1e-2, warmup_steps=0),
                         params, ("enc_",))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(
        updates["params"]["enc_0"]["Dense_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(
        updates["params"]["dec_0"]["Dense_0"]["kernel"]).max()) > 0.0


def _synthetic_vae_dir(root, in_channels=8, res=16):
    d = root / "obj1"
    d.mkdir()
    rng = np.random.default_rng(0)
    torch.save(torch.randn(64, 3) * 0.2, d / "static_frame_vertices.pt")
    torch.save(torch.randn(4, 64, 3) * 0.02, d / "moving_frame_deltas.pt")
    coords = np.stack(np.unravel_index(
        rng.choice(res ** 3, 20, replace=False), (res, res, res)), -1)
    np.savez(d / "voxel_features.npz", coords=coords.astype(np.int32),
             features=rng.standard_normal((20, in_channels)).astype(np.float32),
             resolution=res)
    cams = {}
    for t in range(4):
        views = []
        for v in range(3):
            img = f"img_{t}_{v}.npy"
            np.save(d / img, (rng.random((16, 16, 3)) * 255).astype(np.uint8))
            views.append({"image": img, "c2w": np.eye(4).tolist(),
                          "intrinsics": [[1.0, 0, 0.5], [0, 1.0, 0.5],
                                         [0, 0, 1]]})
        cams[str(t)] = views
    (root / "obj1" / "cameras.json").write_text(json.dumps(cams))


@pytest.mark.slow
def test_main_vae_cli_two_phase_on_mesh(tmp_path):
    """Run the CLI end to end for 2 steps — phase A (static, step 0) and
    phase B (joint, step 1) — DP-sharded over the 8-device test mesh, with a
    TRELLIS-layout init checkpoint (out-layer surgery) and frozen encoder."""
    from gvfdiffusion_tpu.cli.main_vae import main

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    _synthetic_vae_dir(data_dir)

    theirs = _torch_vae(out_channels=10)  # forces out-layer surgery (gs=112)
    ckpt = str(tmp_path / "init.pt")
    torch.save(theirs.state_dict(), ckpt)

    rc = main([
        f"--data_dir={data_dir}", f"--exp_dir={tmp_path / 'exp'}",
        "--static_vae.resolution=16", "--static_vae.in_channels=8",
        "--static_vae.model_channels=32", "--static_vae.latent_channels=4",
        "--static_vae.num_blocks=2", "--static_vae.num_heads=4",
        "--static_vae.window_size=4", "--static_vae.voxel_capacity=32",
        "--motion_vae.depth=1", "--motion_vae.dim=36",
        "--motion_vae.queries_dim=36", "--motion_vae.num_inputs=16",
        "--motion_vae.num_latents=4", "--motion_vae.latent_dim=4",
        "--motion_vae.heads=4", "--motion_vae.knn_k=4",
        "--train.batch_size=1", "--train.total_steps=2",
        "--train.static_vae_steps=1", "--train.warmup_steps=0",
        "--train.log_interval=1", "--train.save_interval=1000",
        "--train.sample_timesteps=2", "--train.grad_accum=1",
        f"--train.static_vae_init={ckpt}",
        "--render.resolution=16", "--render.max_per_tile=32",
        "--loss.lambda_lpips=0",
    ])
    assert rc == 0
