"""Toy TRELLIS image->3D drive: every decode format, end to end.

Tiny random-weight models through the REAL pipeline API
(pipelines/trellis_image_to_3d.py): preprocess -> DINOv2 encode -> ss-flow ->
ss-decode -> slat-flow -> {gaussian, mesh, radiance_field} decode -> render
each format (GS rasterizer / software mesh raster / octree ray-march) and
save a 1x3 contact sheet. Companion to toy_video_to_4d.py (which drives the
4D half); together they cover the full inference surface.

Run: python examples/toy_image_to_3d.py  (TPU if present, else CPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.dinov2 import DinoV2
from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
from gvfdiffusion_tpu.models.trellis.slat_mesh_decoder import SLatMeshDecoder
from gvfdiffusion_tpu.models.trellis.slat_rf_decoder import (
    SLatRadianceFieldDecoder,
)
from gvfdiffusion_tpu.models.trellis.ss_flow import SparseStructureFlowModel
from gvfdiffusion_tpu.models.trellis.ss_vae import SparseStructureDecoder
from gvfdiffusion_tpu.ops.marching_tets import marching_tets_dense
from gvfdiffusion_tpu.pipelines.trellis_image_to_3d import (
    TrellisConfig, TrellisImageTo3DPipeline,
)
from gvfdiffusion_tpu.render.mesh_renderer import render_mesh
from gvfdiffusion_tpu.render.octree_renderer import (OctreeRenderer,
                                                     OctreeRenderOptions)
from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
from gvfdiffusion_tpu.representations.camera import orbit_camera
from gvfdiffusion_tpu.sparse.tensor import from_lists


def stat(name, arr):
    a = np.asarray(arr, np.float32)
    print(f"[{name}] shape={tuple(a.shape)} finite={bool(np.isfinite(a).all())}"
          f" range=({a.min():.3f},{a.max():.3f})")
    assert np.isfinite(a).all(), name


def main():
    print("devices:", jax.devices())
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 10)

    dinov2 = DinoV2(img_size=28, patch_size=14, embed_dim=32, depth=1,
                    num_heads=4, num_register_tokens=2)
    dinov2_p = dinov2.init(ks[0], jnp.zeros((1, 28, 28, 3)))

    ss_flow = SparseStructureFlowModel(
        resolution=8, in_channels=4, model_channels=32, cond_channels=32,
        out_channels=4, num_blocks=1, num_heads=4, patch_size=2)
    ss_flow_p = ss_flow.init(ks[1], jnp.zeros((1, 8, 8, 8, 4)),
                             jnp.zeros((1,)), jnp.zeros((1, 7, 32)))
    ss_dec = SparseStructureDecoder(out_channels=1, latent_channels=4,
                                    num_res_blocks=1, channels=(16, 8))
    ss_dec_p = ss_dec.init(ks[2], jnp.zeros((1, 8, 8, 8, 4)))

    slat_flow = SLatFlowModel(
        resolution=16, in_channels=4, model_channels=32, cond_channels=32,
        out_channels=4, num_blocks=1, num_heads=4, patch_size=2,
        num_io_res_blocks=2, io_block_channels=(16,))
    dummy = from_lists([np.array([[1, 1, 1], [2, 2, 2]])],
                       [np.zeros((2, 4), np.float32)], resolution=16,
                       capacity=64)
    slat_flow_p = slat_flow.init(ks[3], dummy, jnp.zeros((1,)),
                                 jnp.zeros((1, 7, 32)))

    kw = dict(resolution=16, model_channels=32, latent_channels=4,
              num_blocks=1, num_heads=4, window_size=4)
    gs_dec = SLatGaussianDecoder(**kw)
    gs_p = gs_dec.init(ks[4], dummy)
    mesh_dec = SLatMeshDecoder(use_subdivide=False, use_flexi_weights=True, **kw)
    mesh_p = mesh_dec.init(ks[5], dummy)
    rf_dec = SLatRadianceFieldDecoder(rank=2, dim=4, **kw)
    rf_p = rf_dec.init(ks[6], dummy)

    pipe = TrellisImageTo3DPipeline(
        dinov2, dinov2_p, ss_flow, ss_flow_p, ss_dec, ss_dec_p,
        slat_flow, slat_flow_p, gs_dec, gs_p,
        TrellisConfig(ss_steps=2, slat_steps=2, ss_resolution=8,
                      grid_resolution=16, voxel_capacity=64),
        slat_decoder_mesh=mesh_dec, slat_decoder_mesh_params=mesh_p,
        slat_decoder_rf=rf_dec, slat_decoder_rf_params=rf_p,
    )

    # RGBA input image with a centered object
    img = np.zeros((64, 64, 4), np.float32)
    img[16:48, 16:48, :3] = [0.8, 0.3, 0.2]
    img[16:48, 16:48, 3] = 1.0
    pre = pipe.preprocess_image(img)
    small = jax.image.resize(jnp.asarray(pre), (28, 28, 3), "bilinear")[None]
    cond = pipe.encode_image(small)
    stat("dinov2_cond", cond)

    structure = pipe.sample_sparse_structure(cond, ks[7])
    print(f"[structure] occupied={int(np.asarray(structure.valid.sum()))}")
    slat = pipe.sample_slat(structure, cond, ks[8])
    stat("slat", slat.feats)

    out = pipe.decode_slat_formats(
        slat, formats=("gaussian", "mesh", "radiance_field"))

    panels = []
    cam = orbit_camera(30.0, 20.0, radius=1.6, height=64, width=64,
                       target=(0.0, 0.0, 0.0))

    gs, valid = out["gaussian"]
    gs0 = gs.replace(  # batch-0 slice of the per-gaussian fields
        _xyz=gs._xyz[0], _features_dc=gs._features_dc[0],
        _scaling=gs._scaling[0], _rotation=gs._rotation[0],
        _opacity=gs._opacity[0],
    )
    r = GaussianRenderer(RenderOptions(near=0.1, far=10.0, max_per_tile=64,
                                       rounds=2, early_exit=True))
    gimg = r.render(gs0, cam, valid=valid[0])["render"]
    stat("render_gaussian", gimg)
    panels.append(np.asarray(gimg))

    sdf, deform, alpha, res = out["mesh"]
    verts, faces, fvalid = marching_tets_dense(sdf[0], deform[0],
                                               alpha=alpha[0])
    mcam = orbit_camera(30.0, 20.0, radius=1.6, height=64, width=64,
                        target=(0.5, 0.5, 0.5))
    mout = render_mesh(verts, faces, fvalid, mcam)
    mimg = (mout["normal"] * 0.5 + 0.5) * mout["mask"][..., None]
    stat("render_mesh", mimg)
    panels.append(np.asarray(mimg))

    strivec = out["radiance_field"]
    oc = OctreeRenderer(OctreeRenderOptions(num_steps=48))
    oimg = oc.render(strivec, mcam)["color"]
    stat("render_rf", oimg)
    panels.append(np.asarray(oimg))

    sheet = np.concatenate([np.clip(p, 0, 1) for p in panels], axis=1)
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "toy_image_to_3d.png")
    try:
        from PIL import Image

        Image.fromarray((sheet * 255).astype(np.uint8)).save(path)
        print(f"[saved] {path}")
    except ImportError:
        np.save(path.replace(".png", ".npy"), sheet)
    print("IMAGE-TO-3D OK")


if __name__ == "__main__":
    main()
