"""GLB export roundtrip + dataset plumbing tests (synthetic files)."""

import json
import os

import numpy as np

from gvfdiffusion_tpu.utils.glb_export import export_glb, load_glb_meshdata


def test_glb_roundtrip(tmp_path):
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    path = str(tmp_path / "mesh.glb")
    size = export_glb(path, verts, faces, vertex_colors=colors)
    assert size == os.path.getsize(path)
    v, f = load_glb_meshdata(path)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, faces)


def test_glb_from_marching_tets(tmp_path):
    import jax.numpy as jnp

    from gvfdiffusion_tpu.ops.marching_tets import marching_tets_dense, weld_mesh

    g = np.arange(9) / 8
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    sdf = jnp.asarray(
        (np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) - 0.3)
        .astype(np.float32)
    )
    verts, faces, valid = marching_tets_dense(sdf)
    v, f = weld_mesh(np.asarray(verts), np.asarray(faces), np.asarray(valid))
    path = str(tmp_path / "sphere.glb")
    export_glb(path, v, f)
    v2, f2 = load_glb_meshdata(path)
    assert len(v2) == len(v) and len(f2) == len(f)


def test_latent_dataset_synthetic(tmp_path):
    import torch

    from gvfdiffusion_tpu.data.dataset_latent import LatentDataset, load_data

    for name in ("objA", "objB"):
        d = tmp_path / name
        d.mkdir()
        torch.save(
            {
                "latent_mean": torch.randn(6, 8, 4),
                "latent_std": torch.rand(6, 8, 4) * 0.1,
                "fps_sampled_gs_1024": torch.randn(32, 14),
                "fps_sampled_gs_4096": torch.randn(64, 14),
            },
            d / "deformation_latent.pt",
        )
        np.savez(
            d / "dinov2_features.npz",
            features=np.random.randn(6, 5, 1024).astype(np.float32),
        )
    ds = LatentDataset(str(tmp_path), num_frames=4, num_latents=16, uncond_p=0.0)
    assert len(ds) == 2
    item = ds[0]
    assert item["latent"].shape == (4, 8, 4)
    assert item["cond_images"].shape == (4, 5, 1024)
    assert item["static_latent"].shape == (16, 14)
    gen = load_data(ds, batch_size=2)
    batch = next(gen)
    assert batch["latent"].shape == (2, 4, 8, 4)


def test_inference_dataset(tmp_path):
    from gvfdiffusion_tpu.data.dataset_inference import InferenceDataset

    (tmp_path / "objX").mkdir()
    np.savez(
        tmp_path / "objX" / "dinov2_features.npz",
        features=np.zeros((3, 5, 16), np.float32),
    )
    (tmp_path / "in_the_wild.txt").write_text("objX 2\n")
    ds = InferenceDataset(str(tmp_path), num_views=4, resolution=64)
    assert len(ds) == 1
    item = ds[0]
    assert item["canonical_idx"] == 2
    assert item["cond_images"].shape == (3, 5, 16)
    cams = ds.cameras()
    assert len(cams) == 4 and cams[0].height == 64


def test_vae_dataset_synthetic(tmp_path):
    import torch

    from gvfdiffusion_tpu.data.dataset_vae import VAEDataset

    d = tmp_path / "obj1"
    d.mkdir()
    torch.save(torch.randn(64, 3), d / "static_frame_vertices.pt")
    torch.save(torch.randn(4, 64, 3) * 0.05, d / "moving_frame_deltas.pt")
    coords = np.stack(np.unravel_index(np.arange(20), (64, 64, 64)), -1)
    np.savez(
        d / "voxel_features.npz",
        coords=coords.astype(np.int32),
        features=np.random.randn(20, 8).astype(np.float32),
        resolution=64,
    )
    imgs = []
    cams = {}
    for t in range(4):
        views = []
        for v in range(3):
            img_name = f"img_{t}_{v}.npy"
            np.save(d / img_name, (np.random.rand(16, 16, 3) * 255).astype(np.uint8))
            views.append({
                "image": img_name,
                "c2w": np.eye(4).tolist(),
                "intrinsics": [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]],
            })
        cams[str(t)] = views
    (d / "cameras.json").write_text(json.dumps(cams))

    ds = VAEDataset(str(tmp_path), resolution=16, num_points=32,
                    num_timesteps=2, num_views=2, voxel_capacity=64)
    assert len(ds) == 1
    batch = ds.collate([ds[0]])
    assert batch["feats"].feats.shape == (1, 64, 8)
    assert batch["static_pc"].shape == (1, 32, 3)
    assert batch["images"].shape[0] == 1
    assert batch["extrinsics"].shape[-2:] == (4, 4)
