"""Data farm: blender view planning / pose math, Objaverse v1 + XL handlers
(fetcher-injected, fully offline)."""

import gzip
import hashlib
import json
import math
import os

import numpy as np
import pytest

from gvfdiffusion_tpu.data_rendering.blender_script import (
    build_view_plan, camera_pose, intrinsics_from_fov, parse_args,
    plan_to_cameras_json)
from gvfdiffusion_tpu.data_rendering.objaverse import (GitHubXL, ObjaverseV1,
                                                       SketchfabXL,
                                                       SmithsonianXL,
                                                       ThingiverseXL,
                                                       download_xl)


# -- blender planning ---------------------------------------------------------


def test_camera_pose_orbits_and_looks_at_target():
    c2w = camera_pose(0.3, 0.2, radius=2.0)
    eye = c2w[:3, 3]
    assert abs(np.linalg.norm(eye) - 2.0) < 1e-6
    # -z column points from eye to origin
    fwd = -c2w[:3, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-6)
    # orthonormal rotation
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)


def test_camera_pose_matches_orbit_camera_convention():
    """OpenGL c2w emitted by the blender script, run through the dataset's
    opengl_to_colmap_w2c, must equal the training renderer's COLMAP w2c for
    the same orbit — rendered data round-trips without convention drift."""
    from gvfdiffusion_tpu.data.dataset_vae import opengl_to_colmap_w2c
    from gvfdiffusion_tpu.representations.camera import orbit_camera

    yaw, pitch = 0.7, 0.3
    cam = orbit_camera(math.degrees(yaw), math.degrees(pitch), radius=2.0)
    c2w = camera_pose(yaw, pitch, radius=2.0)
    np.testing.assert_allclose(
        opengl_to_colmap_w2c(c2w), np.asarray(cam.world_view), atol=1e-5
    )


def test_intrinsics_from_fov():
    K = intrinsics_from_fov(math.radians(90.0))
    assert abs(K[0, 0] - 0.5) < 1e-6 and K[0, 2] == 0.5


def test_build_view_plan_modes():
    plan = build_view_plan(4, 8, mode_static=True, mode_front=False)
    assert len(plan) == 8 and all(e["frame"] == 0 for e in plan)

    plan = build_view_plan(4, 8, mode_multi=True, mode_front=False)
    assert len(plan) == 8  # 2 views per frame x 4 frames
    assert sorted({e["frame"] for e in plan}) == [0, 1, 2, 3]

    plan = build_view_plan(4, 8, mode_front=True)
    assert len(plan) == 4
    assert all(e["yaw"] == 0.0 for e in plan)

    plan = build_view_plan(2, 8, mode_front=False, mode_four_view=True)
    assert len(plan) == 8
    yaws = sorted({round(e["yaw"], 5) for e in plan})
    assert yaws == [0.0, round(math.pi / 2, 5), round(math.pi, 5),
                    round(3 * math.pi / 2, 5)]

    # augment jitters the front view deterministically per seed
    a = build_view_plan(2, 4, augment=True, seed=1)
    b = build_view_plan(2, 4, augment=True, seed=1)
    c = build_view_plan(2, 4, augment=True, seed=2)
    assert a == b and a != c and a[0]["yaw"] != 0.0


def test_plan_to_cameras_json_contract():
    plan = build_view_plan(3, 4, mode_front=True, mode_four_view=True)
    cams = plan_to_cameras_json(plan, 256)
    assert set(cams) == {"0", "1", "2"}
    v = cams["0"][0]
    assert set(v) == {"image", "c2w", "intrinsics", "resolution"}
    assert np.asarray(v["c2w"]).shape == (4, 4)
    assert np.asarray(v["intrinsics"]).shape == (3, 3)
    json.dumps(cams)  # serializable


def test_parse_args_blender_style():
    args = parse_args(["--object_path", "a.glb", "--output_dir", "o",
                       "--frame_num", "8", "--mode_multi", "1"])
    assert args.frame_num == 8 and args.mode_multi == 1 and not args.augment


# -- objaverse ----------------------------------------------------------------


def make_fake_fetcher(tmp_path, files):
    """files: url -> bytes. Records requested URLs."""
    calls = []

    def fetch(url, dest):
        calls.append(url)
        if url not in files:
            raise IOError(f"404 {url}")
        with open(dest, "wb") as f:
            f.write(files[url])

    fetch.calls = calls
    return fetch


def gz(obj) -> bytes:
    return gzip.compress(json.dumps(obj).encode())


def test_objaverse_v1_manifest_annotations_objects(tmp_path):
    hf = "https://huggingface.co/datasets/allenai/objaverse/resolve/main"
    paths = {"uid1": "glbs/000-017/uid1.glb", "uid2": "glbs/000-031/uid2.glb"}
    files = {
        f"{hf}/object-paths.json.gz": gz(paths),
        f"{hf}/metadata/000-017.json.gz": gz({"uid1": {"name": "a"}}),
        f"{hf}/metadata/000-031.json.gz": gz({"uid2": {"name": "b"}}),
        f"{hf}/glbs/000-017/uid1.glb": b"GLB1",
        f"{hf}/glbs/000-031/uid2.glb": b"GLB2",
    }
    fetch = make_fake_fetcher(tmp_path, files)
    v1 = ObjaverseV1(str(tmp_path / "v1"), fetcher=fetch)

    assert sorted(v1.load_uids()) == ["uid1", "uid2"]
    ann = v1.load_annotations(["uid1"])
    assert ann == {"uid1": {"name": "a"}}

    got = v1.load_objects(["uid1", "uid2"], processes=2)
    assert open(got["uid1"], "rb").read() == b"GLB1"
    # cached: a second call issues no new fetches
    n = len(fetch.calls)
    v1.load_objects(["uid1"])
    assert len(fetch.calls) == n


def test_objaverse_v1_shard_ids():
    ids = ObjaverseV1.all_shard_ids()
    assert len(ids) == 160 and ids[0] == "000-000" and ids[-1] == "000-159"


def test_github_xl_url_and_path(tmp_path):
    rec = {"fileIdentifier":
           "https://github.com/org/repo/blob/abc123def456/models/car.glb",
           "source": "github"}
    h = GitHubXL(str(tmp_path), fetcher=lambda u, d: None)
    assert h.object_url(rec) == (
        "https://raw.githubusercontent.com/org/repo/abc123def456/models/car.glb"
    )
    assert h.local_path(rec).endswith(
        os.path.join("github", "org", "repo", "abc123def456", "car.glb"))
    with pytest.raises(ValueError):
        h.object_url({"fileIdentifier": "https://github.com/org/repo"})


def test_thingiverse_and_smithsonian_urls(tmp_path):
    t = ThingiverseXL(str(tmp_path), fetcher=lambda u, d: None)
    rec = {"fileIdentifier":
           "https://www.thingiverse.com/thing:55/file:99", "source": "thingiverse"}
    assert t.object_url(rec) == "https://www.thingiverse.com/download:99"
    assert t.local_path(rec).endswith(
        os.path.join("thingiverse", "thing-55", "file-99.stl"))

    s = SmithsonianXL(str(tmp_path), fetcher=lambda u, d: None)
    rec = {"fileIdentifier": "https://smithsonian.example/x.glb"}
    assert s.object_url(rec) == rec["fileIdentifier"]


def test_download_xl_dispatch_sha256_and_sketchfab(tmp_path):
    hf = "https://huggingface.co/datasets/allenai/objaverse/resolve/main"
    blob = b"MESHDATA"
    files = {
        "https://raw.githubusercontent.com/o/r/c0ffee/m.glb": blob,
        f"{hf}/object-paths.json.gz": gz({"deadbeef": "glbs/000-001/deadbeef.glb"}),
        f"{hf}/glbs/000-001/deadbeef.glb": b"SKFB",
    }
    fetch = make_fake_fetcher(tmp_path, files)
    records = [
        {"source": "github", "sha256": hashlib.sha256(blob).hexdigest(),
         "fileIdentifier": "https://github.com/o/r/blob/c0ffee/m.glb"},
        {"source": "sketchfab",
         "fileIdentifier": "https://sketchfab.com/3d-models/car-deadbeef"},
    ]
    got = download_xl(records, cache_dir=str(tmp_path / "xl"), fetcher=fetch)
    assert open(got[records[0]["fileIdentifier"]], "rb").read() == blob
    assert open(got[records[1]["fileIdentifier"]], "rb").read() == b"SKFB"

    # corrupt checksum -> hard error, no file left behind
    bad = [{"source": "github", "sha256": "0" * 64,
            "fileIdentifier": "https://github.com/o/r/blob/c0ffee/m.glb"}]
    with pytest.raises(IOError):
        download_xl(bad, cache_dir=str(tmp_path / "xl2"), fetcher=fetch)
    with pytest.raises(ValueError):
        download_xl([{"source": "nope", "fileIdentifier": "x"}],
                    cache_dir=str(tmp_path / "xl3"), fetcher=fetch)


def test_orchestrator_blender_command_uses_script():
    from gvfdiffusion_tpu.data_rendering.orchestrator import (RenderJob,
                                                              blender_command)

    job = RenderJob(obj_path="x.glb", out_dir="out", mode_multi=True,
                    gpu_id=3, augment=True)
    cmd = blender_command(job)
    assert "--background" in cmd
    assert cmd[cmd.index("--object_path") + 1] == "x.glb"
    assert cmd[cmd.index("--gpu_id") + 1] == "3"
    assert cmd[cmd.index("--mode_multi") + 1] == "1"
    assert "--augment" in cmd
    assert cmd[cmd.index("--python") + 1].endswith("blender_script.py")
