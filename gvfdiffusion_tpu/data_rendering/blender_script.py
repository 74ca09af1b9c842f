"""Headless Blender render script for the offline 4D data farm.

The TPU-native counterpart of the reference's data_rendering/blender_new.py
(1.4k-LoC bpy driver invoked per object by render.py's GPU pool): import any
mesh/animation format, normalize the scene into the unit cube, sample
`frame_num` animation frames, render `view_num` RGBA views per the chosen
camera modes, and write the `cameras.json` contract our datasets load
(data/dataset_vae.py:129 — {frame: [{image, c2w (OpenGL), intrinsics}]}).

Run inside Blender:

    blender --background --python blender_script.py -- \
        --object_path x.glb --output_dir out/ --frame_num 24 --view_num 100 \
        --resolution 512 [--mode_multi 1] [--mode_static 1] [--mode_front 1]
        [--mode_four_view 1] [--augment] [--gpu_id 0] [--engine CYCLES]

Everything above the BPY SECTION marker is pure Python/numpy — the view
planning, pose math, and metadata layout are unit-tested without Blender
(tests/test_data_rendering.py); bpy is imported only inside main().
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from typing import Dict, List, Optional

import numpy as np

from .orchestrator import sphere_hammersley_sequence

# -- pure view planning (no bpy) ---------------------------------------------


def camera_pose(yaw: float, pitch: float, radius: float,
                target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """[4,4] OpenGL camera-to-world (camera looks down -z, y up) orbiting
    `target`. Matches representations/camera.orbit_camera's convention so
    rendered data round-trips into the training renderer."""
    eye = np.asarray([
        radius * math.cos(pitch) * math.sin(yaw),
        radius * math.cos(pitch) * math.cos(yaw),
        radius * math.sin(pitch),
    ]) + np.asarray(target)
    fwd = np.asarray(target) - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    up = np.asarray([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.asarray([1.0, 0.0, 0.0])
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -fwd  # OpenGL: -z forward
    c2w[:3, 3] = eye
    return c2w


def intrinsics_from_fov(fov: float) -> np.ndarray:
    """Normalized [3,3] pinhole intrinsics from a (square) FoV in radians."""
    f = 0.5 / math.tan(fov / 2.0)
    return np.asarray([[f, 0.0, 0.5], [0.0, f, 0.5], [0.0, 0.0, 1.0]])


def build_view_plan(
    frame_num: int,
    view_num: int,
    mode_multi: bool = False,
    mode_static: bool = False,
    mode_front: bool = True,
    mode_four_view: bool = False,
    augment: bool = False,
    radius: float = 2.0,
    fov: float = math.radians(40.0),
    seed: int = 0,
) -> List[Dict]:
    """List of {frame, view_name, yaw, pitch, radius, fov} entries — the
    composition of the reference's camera modes (blender_new.py argument
    surface mirrored by render.py:15-19):

      static     frame 0 only, `view_num` Hammersley sphere views
      multi      every frame from `view_num // frame_num` random sphere views
      front      one fixed front view tracking every frame (the in-the-wild
                 conditioning view); `augment` jitters its azimuth/elevation
      four_view  4 canonical azimuths (0/90/180/270) every frame
    """
    rng = np.random.default_rng(seed)
    offset = (float(rng.uniform(0, 1)), float(rng.uniform(0, 1)))
    plan: List[Dict] = []

    def add(frame, name, yaw, pitch, r=None, f=None):
        plan.append(dict(
            frame=int(frame), view_name=name, yaw=float(yaw),
            pitch=float(pitch), radius=float(r if r is not None else radius),
            fov=float(f if f is not None else fov),
        ))

    if mode_static:
        for v in range(view_num):
            yaw, pitch = sphere_hammersley_sequence(v, view_num, offset)
            add(0, f"static_{v:04d}", yaw, pitch,
                r=radius * float(rng.uniform(0.9, 1.1)))
    if mode_multi:
        per_frame = max(1, view_num // max(frame_num, 1))
        for t in range(frame_num):
            for v in range(per_frame):
                i = t * per_frame + v
                yaw, pitch = sphere_hammersley_sequence(
                    i, frame_num * per_frame, offset
                )
                add(t, f"multi_{t:03d}_{v:03d}", yaw, pitch)
    if mode_front:
        yaw0, pitch0 = 0.0, 0.0
        if augment:
            yaw0 = float(rng.uniform(0, 2 * math.pi))
            pitch0 = float(rng.uniform(-0.3, 0.5))
        for t in range(frame_num):
            add(t, f"front_{t:03d}", yaw0, pitch0)
    if mode_four_view:
        for t in range(frame_num):
            for q in range(4):
                add(t, f"four_{t:03d}_{q}", q * math.pi / 2.0, 0.0)
    return plan


def plan_to_cameras_json(plan: List[Dict], resolution: int) -> Dict:
    """{frame: [{image, c2w, intrinsics}]} — the dataset contract."""
    out: Dict[str, List] = {}
    for e in plan:
        c2w = camera_pose(e["yaw"], e["pitch"], e["radius"])
        out.setdefault(str(e["frame"]), []).append(dict(
            image=f"{e['view_name']}.npy",
            c2w=c2w.tolist(),
            intrinsics=intrinsics_from_fov(e["fov"]).tolist(),
            resolution=resolution,
        ))
    return out


def parse_args(argv: Optional[List[str]] = None):
    if argv is None:
        argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument("--object_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--frame_num", type=int, default=24)
    p.add_argument("--view_num", type=int, default=100)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--gpu_id", type=int, default=0)
    p.add_argument("--mode_multi", type=int, default=0)
    p.add_argument("--mode_static", type=int, default=0)
    p.add_argument("--mode_front", type=int, default=1)
    p.add_argument("--mode_four_view", type=int, default=0)
    p.add_argument("--augment", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--engine", default="CYCLES",
                   choices=["CYCLES", "BLENDER_EEVEE"])
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


# -- BPY SECTION (only runs inside Blender) -----------------------------------

# maps file extension -> bpy import operator name (resolved lazily)
IMPORT_OPS = {
    "obj": ("wm", "obj_import"), "glb": ("import_scene", "gltf"),
    "gltf": ("import_scene", "gltf"), "fbx": ("import_scene", "fbx"),
    "stl": ("import_mesh", "stl"), "dae": ("wm", "collada_import"),
    "ply": ("import_mesh", "ply"), "usd": ("import_scene", "usd"),
    "abc": ("wm", "alembic_import"),
}


def _bpy_import_object(bpy, path: str):
    ext = path.rsplit(".", 1)[-1].lower()
    if ext not in IMPORT_OPS:
        raise ValueError(f"unsupported format .{ext}")
    mod, op = IMPORT_OPS[ext]
    getattr(getattr(bpy.ops, mod), op)(filepath=path)


def _bpy_scene_bounds(bpy):
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for obj in bpy.context.scene.objects:
        if obj.type != "MESH":
            continue
        for corner in obj.bound_box:
            w = obj.matrix_world @ type(obj.bound_box[0])(corner) \
                if hasattr(corner, "__matmul__") else obj.matrix_world @ corner
            v = np.asarray([w[0], w[1], w[2]])
            lo = np.minimum(lo, v)
            hi = np.maximum(hi, v)
    return lo, hi


def _bpy_normalize_scene(bpy):
    """Uniform-scale + center the imported objects into [-0.5, 0.5]^3 (the
    reference normalizes every asset the same way before rendering)."""
    from mathutils import Vector

    lo, hi = _bpy_scene_bounds(bpy)
    size = float(np.max(hi - lo))
    if not np.isfinite(size) or size <= 0:
        return
    scale = 1.0 / size
    center = (lo + hi) / 2.0
    root = bpy.data.objects.new("normalize_root", None)
    bpy.context.scene.collection.objects.link(root)
    for obj in list(bpy.context.scene.objects):
        if obj.parent is None and obj is not root and obj.type != "CAMERA":
            obj.parent = root
    root.scale = (scale, scale, scale)
    root.location = Vector((-center * scale).tolist())


def _bpy_setup(bpy, args):
    scene = bpy.context.scene
    scene.render.engine = args.engine
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.film_transparent = True  # RGBA: alpha = object mask
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_mode = "RGBA"
    if args.engine == "CYCLES":
        scene.cycles.samples = 64
        scene.cycles.use_denoising = True
        prefs = bpy.context.preferences.addons.get("cycles")
        if prefs is not None:
            cp = prefs.preferences
            cp.compute_device_type = "CUDA"
            cp.get_devices()
            for i, dev in enumerate(cp.devices):
                dev.use = (dev.type == "CPU") or (i == args.gpu_id)
    # uniform environment light
    world = bpy.data.worlds.new("uniform") if scene.world is None else scene.world
    scene.world = world
    world.use_nodes = True
    bg = world.node_tree.nodes.get("Background")
    if bg is not None:
        bg.inputs[0].default_value = (1.0, 1.0, 1.0, 1.0)
        bg.inputs[1].default_value = 1.0
    # camera
    cam_data = bpy.data.cameras.new("cam")
    cam = bpy.data.objects.new("cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam
    return cam


def main():
    args = parse_args()
    import bpy  # only available inside Blender

    os.makedirs(args.output_dir, exist_ok=True)
    done_marker = os.path.join(args.output_dir, "cameras.json")
    if os.path.exists(done_marker) and not args.overwrite:
        print(f"[blender] {args.output_dir} exists; skip (use --overwrite)")
        return

    bpy.ops.wm.read_factory_settings(use_empty=True)
    _bpy_import_object(bpy, args.object_path)
    _bpy_normalize_scene(bpy)
    cam = _bpy_setup(bpy, args)

    scene = bpy.context.scene
    src_start, src_end = scene.frame_start, max(scene.frame_end, 1)
    plan = build_view_plan(
        args.frame_num, args.view_num, mode_multi=bool(args.mode_multi),
        mode_static=bool(args.mode_static), mode_front=bool(args.mode_front),
        mode_four_view=bool(args.mode_four_view), augment=args.augment,
        seed=args.seed,
    )
    from mathutils import Matrix

    for e in plan:
        # sample the source animation range uniformly onto frame_num frames
        t = e["frame"] / max(args.frame_num - 1, 1)
        scene.frame_set(int(round(src_start + t * (src_end - src_start))))
        cam.data.angle = e["fov"]
        c2w = camera_pose(e["yaw"], e["pitch"], e["radius"])
        cam.matrix_world = Matrix(c2w.tolist())
        scene.render.filepath = os.path.join(
            args.output_dir, e["view_name"] + ".png")
        bpy.ops.render.render(write_still=True)

    cams = plan_to_cameras_json(plan, args.resolution)
    # images were rendered as PNG; point the manifest at them
    for views in cams.values():
        for v in views:
            v["image"] = v["image"].replace(".npy", ".png")
    with open(done_marker, "w") as f:
        json.dump(cams, f)
    print(f"[blender] rendered {len(plan)} views -> {args.output_dir}")


if __name__ == "__main__":
    main()
