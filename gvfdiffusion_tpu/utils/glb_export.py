"""Minimal GLB (glTF 2.0 binary) mesh export — pure Python.

Capability re-design of the reference's GLB export path
(trellis/utils/postprocessing_utils.py:398 to_glb, which goes through
trimesh): writes a valid glTF 2.0 binary container with one mesh primitive
(positions + indices + optional vertex colors + normals). Texture baking
(xatlas UV-parametrization + nvdiffrast optimization, postprocessing_utils.py:
275) depends on external GPU tooling and is out of scope; vertex colors carry
appearance instead.
"""

from __future__ import annotations

import json
import struct
from typing import Optional

import numpy as np

_COMPONENT_F32 = 5126
_COMPONENT_U32 = 5125
_ARRAY_BUFFER = 34962
_ELEMENT_ARRAY_BUFFER = 34963


def _pad4(data: bytes, pad_byte: bytes = b"\x00") -> bytes:
    return data + pad_byte * ((4 - len(data) % 4) % 4)


def export_glb(
    path: str,
    vertices: np.ndarray,          # [V, 3] float
    faces: np.ndarray,             # [F, 3] int
    vertex_colors: Optional[np.ndarray] = None,  # [V, 3] float in [0,1]
    normals: Optional[np.ndarray] = None,        # [V, 3]
    uvs: Optional[np.ndarray] = None,            # [V, 2] float in [0,1]
    texture_png: Optional[bytes] = None,         # PNG bytes (with uvs)
) -> int:
    """Write a .glb file; returns byte size.

    With `uvs` + `texture_png`, the mesh gets a textured PBR material
    (reference trellis/utils/postprocessing_utils.py:398 to_glb exports
    xatlas-unwrapped baked textures; utils/texture_bake.py produces the
    equivalent inputs here)."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    indices = np.ascontiguousarray(faces, np.uint32).reshape(-1)

    blobs = []
    buffer_views = []
    accessors = []
    attributes = {}

    def add_blob(data: bytes, target: int) -> int:
        offset = sum(len(b) for b in blobs)
        blobs.append(_pad4(data))
        buffer_views.append({
            "buffer": 0, "byteOffset": offset, "byteLength": len(data),
            "target": target,
        })
        return len(buffer_views) - 1

    # positions
    bv = add_blob(vertices.tobytes(), _ARRAY_BUFFER)
    accessors.append({
        "bufferView": bv, "componentType": _COMPONENT_F32,
        "count": len(vertices), "type": "VEC3",
        "min": vertices.min(0).tolist(), "max": vertices.max(0).tolist(),
    })
    attributes["POSITION"] = len(accessors) - 1

    if normals is not None:
        normals = np.ascontiguousarray(normals, np.float32)
        bv = add_blob(normals.tobytes(), _ARRAY_BUFFER)
        accessors.append({
            "bufferView": bv, "componentType": _COMPONENT_F32,
            "count": len(normals), "type": "VEC3",
        })
        attributes["NORMAL"] = len(accessors) - 1

    if vertex_colors is not None:
        colors = np.ascontiguousarray(
            np.clip(vertex_colors, 0, 1), np.float32
        )
        bv = add_blob(colors.tobytes(), _ARRAY_BUFFER)
        accessors.append({
            "bufferView": bv, "componentType": _COMPONENT_F32,
            "count": len(colors), "type": "VEC3",
        })
        attributes["COLOR_0"] = len(accessors) - 1

    if uvs is not None:
        uv = np.ascontiguousarray(uvs, np.float32)
        bv = add_blob(uv.tobytes(), _ARRAY_BUFFER)
        accessors.append({
            "bufferView": bv, "componentType": _COMPONENT_F32,
            "count": len(uv), "type": "VEC2",
        })
        attributes["TEXCOORD_0"] = len(accessors) - 1

    bv = add_blob(indices.tobytes(), _ELEMENT_ARRAY_BUFFER)
    accessors.append({
        "bufferView": bv, "componentType": _COMPONENT_U32,
        "count": len(indices), "type": "SCALAR",
    })
    idx_accessor = len(accessors) - 1

    primitive = {
        "attributes": attributes,
        "indices": idx_accessor,
        "mode": 4,
    }
    gltf = {
        "asset": {"version": "2.0", "generator": "gvfdiffusion_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [primitive]}],
        "bufferViews": buffer_views,
        "accessors": accessors,
        "buffers": [{"byteLength": 0}],  # patched below
    }

    if texture_png is not None and uvs is not None:
        img_bv = add_blob(texture_png, _ARRAY_BUFFER)
        # image bufferViews must not carry a vertex-attribute target
        buffer_views[img_bv].pop("target", None)
        gltf["images"] = [{"bufferView": img_bv, "mimeType": "image/png"}]
        gltf["samplers"] = [{"magFilter": 9729, "minFilter": 9729,
                             "wrapS": 33071, "wrapT": 33071}]
        gltf["textures"] = [{"source": 0, "sampler": 0}]
        gltf["materials"] = [{
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0,
                "roughnessFactor": 1.0,
            },
            "doubleSided": True,
        }]
        primitive["material"] = 0

    gltf["buffers"] = [{"byteLength": sum(len(b) for b in blobs)}]

    json_chunk = _pad4(json.dumps(gltf).encode("utf-8"), b" ")
    bin_chunk = b"".join(blobs)
    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))  # glTF magic
        f.write(struct.pack("<II", len(json_chunk), 0x4E4F534A))  # JSON
        f.write(json_chunk)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))  # BIN
        f.write(bin_chunk)
    return total


def load_glb_meshdata(path: str):
    """Minimal reader (for tests): returns (vertices, faces)."""
    with open(path, "rb") as f:
        magic, version, _ = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67 and version == 2
        jlen, jtype = struct.unpack("<II", f.read(8))
        gltf = json.loads(f.read(jlen))
        blen, btype = struct.unpack("<II", f.read(8))
        blob = f.read(blen)
    prim = gltf["meshes"][0]["primitives"][0]

    def read_accessor(i):
        acc = gltf["accessors"][i]
        bv = gltf["bufferViews"][acc["bufferView"]]
        dtype = np.float32 if acc["componentType"] == _COMPONENT_F32 else np.uint32
        n = acc["count"] * (3 if acc["type"] == "VEC3" else 1)
        arr = np.frombuffer(
            blob, dtype, count=n, offset=bv["byteOffset"]
        )
        return arr.reshape(acc["count"], -1) if acc["type"] == "VEC3" else arr

    verts = read_accessor(prim["attributes"]["POSITION"])
    faces = read_accessor(prim["indices"]).reshape(-1, 3)
    return verts, faces
