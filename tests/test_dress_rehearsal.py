"""Checkpoint-file dress rehearsal (VERDICT r4 item 4): the *file-level*
loading path, end to end, against locally fabricated checkpoint files in the
exact HF release layout — so swapping in the real release is a pure byte
swap.

Covers: download-map resolution (offline mirror) -> torch .pt parse ->
DDP "module." prefix strip -> weight conversion -> flax forward numerics vs
the reference torch module loaded FROM THE SAME FILES -> mean/std stat
tensors -> safetensors parse + static-VAE->SLat-decoder surgery.

Reference anchors: utils/inference_utils.py:21-34,384-445 (release map),
inference_dpm_latent.py:79-115 (parse + prefix strip), :150-153 (stats),
trellis/models/__init__.py:46-97 (safetensors + surgery).

The one thing this image cannot retire is the remote bytes themselves (zero
egress) and a CUDA reference render; the rendered-frame comparison is
covered by the module-level goldens + tests/test_rasterizer_backends.py.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_loader

torch = pytest.importorskip("torch")

from gvfdiffusion_tpu.utils import hub
from gvfdiffusion_tpu.utils import weight_convert as wc

REPO = hub.MODEL_REPOS["GVFDiffusion_v1.0"]

DIT_CFG = dict(
    resolution=8, in_channels=6, model_channels=64, static_cond_channels=7,
    image_cond_channels=9, out_channels=6, num_blocks=2, num_heads=4,
    pe_mode="ape", share_mod=False, qk_rms_norm=True, no_temporal_attn=False,
)
VAE_KW = dict(depth=2, dim=24, queries_dim=24, input_dim=3, gs_dim=14,
              output_dim=14, num_inputs=32, num_latents=8, latent_dim=4,
              heads=4, knn_k=4, beta=7.0)
SVAE_KW = dict(resolution=16, in_channels=8, model_channels=32,
               out_channels=10, latent_channels=4, num_blocks=2,
               window_size=4, num_heads=4)


def _randomize(module, seed, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for _, p in module.named_parameters():
            if p.dtype.is_floating_point:
                p.copy_(torch.randn(p.shape, generator=g, dtype=p.dtype)
                        * scale)
    return module


def _ddp_wrap(sd):
    """The released EMA checkpoints carry DDP's 'module.' prefix on some or
    all keys (the reference strips it unconditionally per key)."""
    out = OrderedDict()
    for i, (k, v) in enumerate(sd.items()):
        out[("module." + k) if i % 2 == 0 else k] = v
    return out


@pytest.fixture(scope="module")
def fabricated_release(tmp_path_factory):
    """Write a full release into <tmp>/<repo_id>/ with the exact filenames."""
    root = tmp_path_factory.mktemp("hub")
    repo_dir = root / REPO["repo_id"]
    repo_dir.mkdir(parents=True)

    ref_dit = ref_loader.load_ref("model.dit")
    dit = _randomize(ref_dit.DiT(
        num_head_channels=DIT_CFG["model_channels"] // DIT_CFG["num_heads"],
        **DIT_CFG).eval(), seed=1)
    torch.save(_ddp_wrap(dit.state_dict()),
               repo_dir / REPO["model_path"])

    ref_ae = ref_loader.load_ref("model.autoencoder")
    vae = _randomize(ref_ae.GSKLTemporalVariationalAutoEncoder(
        num_timesteps=3, dim_head=-1, chunk_size=8192, **VAE_KW).eval(),
        seed=2)
    torch.save(_ddp_wrap(vae.state_dict()), repo_dir / REPO["vae_path"])

    stv = ref_loader.load_ref(
        "model.sparse_voxel_diffusion.sparse_transformer_vae")
    svae = _randomize(stv.SparseTransformerVAE(
        num_head_channels=8, attn_mode="swin", norm_output=True,
        use_old_attn_impl=False, **SVAE_KW).eval(), seed=3, scale=0.1)
    torch.save(_ddp_wrap(svae.state_dict()),
               repo_dir / REPO["static_vae_path"])

    g = torch.Generator().manual_seed(9)
    stats = {}
    for key in ("static_mean", "static_std", "deformation_mean",
                "deformation_std"):
        t = torch.rand((14 if "static" in key else 4,), generator=g) + 0.5
        torch.save(t, repo_dir / REPO[key + "_path"])
        stats[key] = t.numpy()
    return dict(root=str(root), dit=dit, vae=vae, svae=svae, stats=stats)


def test_offline_resolution_and_missing_file(fabricated_release):
    files = hub.download_model_files("GVFDiffusion_v1.0",
                                     local_hub=fabricated_release["root"])
    assert set(files) == {"ckpt", "vae_ckpt", "static_vae_ckpt",
                          "static_mean", "static_std", "deformation_mean",
                          "deformation_std"}
    for p in files.values():
        assert os.path.exists(p)
    with pytest.raises(ValueError):
        hub.download_model_files("nope", local_hub=fabricated_release["root"])


def test_file_level_gvf_release_numerics(fabricated_release):
    """download map -> parse -> strip -> convert -> forward, compared against
    the torch modules THE FILES WERE WRITTEN FROM."""
    files = hub.download_model_files("GVFDiffusion_v1.0",
                                     local_hub=fabricated_release["root"])
    loaded = hub.load_gvf_release(
        files,
        dit_kwargs=dict(num_blocks=2, qk_rms_norm=True,
                        no_temporal_attn=False, share_mod=False),
        vae_kwargs=dict(depth=2),
        static_vae_kwargs=dict(num_blocks=2, num_heads=4,
                               old_qkv_layout=False),
    )
    for key, ref in fabricated_release["stats"].items():
        np.testing.assert_array_equal(loaded[key], ref)

    # DiT forward: flax-from-files vs torch-from-memory
    from gvfdiffusion_tpu.models.dit import DiT

    rng = np.random.default_rng(6)
    B, T, N, Cin, L, Ns = 1, 2, 8, 6, 5, 4
    x = rng.normal(size=(B, T, N, Cin)).astype(np.float32)
    t = np.array([7.0], np.float32)
    cond = rng.normal(size=(B, T, L, 9)).astype(np.float32)
    static = rng.normal(size=(B, Ns, 7)).astype(np.float32)
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = fabricated_release["dit"](
            torch.tensor(x), torch.tensor(t), torch.tensor(cond),
            torch.tensor(static), torch.tensor(xyz))
    my_out = DiT(**DIT_CFG).apply(
        jax.tree.map(jnp.asarray, loaded["dit"]),
        jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond),
        jnp.asarray(static), jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(my_out),
                               ref_out.detach().numpy(),
                               rtol=2e-4, atol=2e-4)

    # motion-VAE decode through the same file-level params
    from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs

    G, Tv = 16, 3
    z = rng.normal(size=(1 * Tv, 8, 4)).astype(np.float32)
    gs_list = [rng.normal(size=(G, 14)).astype(np.float32)]
    padded, _ = pad_static_gs(gs_list)
    with torch.no_grad():
        t_dec = fabricated_release["vae"].decode(
            torch.tensor(z), torch.stack([torch.tensor(g) for g in gs_list]))
    m_dec = MotionVAE(**VAE_KW).apply(
        jax.tree.map(jnp.asarray, loaded["motion_vae"]), jnp.asarray(z),
        padded, Tv, method=MotionVAE.decode)
    np.testing.assert_allclose(
        np.asarray(m_dec), t_dec.detach().numpy().reshape(1, Tv, G, -1),
        rtol=2e-4, atol=2e-4)


def test_safetensors_parse_and_slat_surgery(fabricated_release, tmp_path):
    """The TRELLIS-side file format: write the static-VAE state dict as
    .safetensors, parse it through the same loader, and run the static-VAE ->
    SLat-gaussian-decoder surgery — file-level result must equal the
    in-memory conversion bit for bit (reference surgery:
    trellis/models/__init__.py:46-76)."""
    safetensors = pytest.importorskip("safetensors.torch")
    path = tmp_path / "static_vae.safetensors"
    sd = {k: v.contiguous()
          for k, v in fabricated_release["svae"].state_dict().items()}
    safetensors.save_file(sd, str(path))

    from_file = wc.load_torch_checkpoint(str(path))
    in_memory = {k: v.numpy() for k, v in sd.items()}
    assert set(from_file) == set(in_memory)
    for k in in_memory:
        np.testing.assert_array_equal(from_file[k], in_memory[k])

    from gvfdiffusion_tpu.models.registry import flatten_tree

    conv_file = wc.convert_static_vae_to_slat_decoder(from_file, num_blocks=2)
    conv_mem = wc.convert_static_vae_to_slat_decoder(in_memory, num_blocks=2)
    flat_f = flatten_tree(conv_file)
    flat_m = flatten_tree(conv_mem)
    assert set(flat_f) == set(flat_m) and flat_f
    for k in flat_f:
        np.testing.assert_array_equal(flat_f[k], flat_m[k])
