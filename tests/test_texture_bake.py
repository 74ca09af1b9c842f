"""UV unwrap + texture bake + textured GLB export."""

import json
import struct

import numpy as np

from gvfdiffusion_tpu.utils.glb_export import export_glb, load_glb_meshdata
from gvfdiffusion_tpu.utils.texture_bake import (
    bake_texture, box_unwrap, decode_png_size, encode_png,
    gaussian_color_sampler, to_textured_glb,
)


def make_cube():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x- x+
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y- y+
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z- z+
    ], np.int64)
    return v, f


def test_box_unwrap_valid_uvs():
    v, f = make_cube()
    v2, f2, uv = box_unwrap(v, f)
    assert f2.shape == f.shape
    assert (uv >= 0).all() and (uv <= 1).all()
    assert f2.max() < len(v2)
    # every face's three corners land in the SAME chart cell
    cell = np.stack([np.floor(uv[:, 0] * 3), np.floor(uv[:, 1] * 2)], 1)
    for face in f2:
        cells = cell[face]
        assert (cells == cells[0]).all()


def test_bake_texture_position_colors():
    """sample_fn = world position as RGB -> covered texels carry positions."""
    v, f = make_cube()
    v2, f2, uv = box_unwrap(v, f)
    tex = bake_texture(v2, f2, uv, lambda p: np.clip(p, 0, 1), size=96, dilate=0)
    covered = tex.sum(-1) > 0
    assert covered.mean() > 0.3  # charts fill a good part of the atlas
    assert tex.max() <= 1.0 and tex.min() >= 0.0


def test_gaussian_sampler_blends_nearby_colors():
    xyz = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)
    # SH DC chosen so colors are ~(1,0,0) and ~(0,1,0)
    c0 = 0.28209479177387814
    dc = np.array([[[(0.5) / c0, -0.5 / c0, -0.5 / c0]],
                   [[-0.5 / c0, 0.5 / c0, -0.5 / c0]]], np.float32)
    fn = gaussian_color_sampler(xyz, dc, k=2)
    cols = fn(np.array([[0.01, 0, 0], [0.99, 0, 0]], np.float32))
    assert cols[0, 0] > 0.9 and cols[0, 1] < 0.1
    assert cols[1, 1] > 0.9 and cols[1, 0] < 0.1


def test_textured_glb_roundtrip(tmp_path):
    v, f = make_cube()
    xyz = np.random.default_rng(0).uniform(0, 1, (64, 3)).astype(np.float32)
    dc = np.random.default_rng(1).normal(size=(64, 1, 3)).astype(np.float32)
    path = str(tmp_path / "mesh.glb")
    size = to_textured_glb(path, v, f, xyz, dc, texture_size=64)
    assert size > 0

    # GLB parses; texture + TEXCOORD_0 + material present; PNG well-formed
    with open(path, "rb") as fh:
        magic, ver, _ = struct.unpack("<III", fh.read(12))
        assert magic == 0x46546C67
        jlen, _ = struct.unpack("<II", fh.read(8))
        gltf = json.loads(fh.read(jlen))
        blob = fh.read()[8:]
    prim = gltf["meshes"][0]["primitives"][0]
    assert "TEXCOORD_0" in prim["attributes"]
    assert prim["material"] == 0
    assert gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"]["index"] == 0
    img_bv = gltf["bufferViews"][gltf["images"][0]["bufferView"]]
    png = blob[img_bv["byteOffset"]: img_bv["byteOffset"] + img_bv["byteLength"]]
    assert decode_png_size(png) == (64, 64)

    verts, faces = load_glb_meshdata(path)
    assert faces.shape[1] == 3 and verts.shape[1] == 3


def test_png_encoder_roundtrip_size():
    img = np.random.default_rng(2).uniform(0, 1, (32, 48, 3))
    data = encode_png(img)
    assert decode_png_size(data) == (48, 32)
