"""Render-orchestration tests (no Blender: fake run_fn)."""

import json
import os

import numpy as np

from gvfdiffusion_tpu.data_rendering.orchestrator import (
    DevicePool, RenderJob, blender_command, build_metadata, make_camera_rig,
    sphere_hammersley_sequence,
)


def test_sphere_hammersley_covers_sphere():
    pts = [sphere_hammersley_sequence(i, 64) for i in range(64)]
    yaws = np.array([p[0] for p in pts])
    pitches = np.array([p[1] for p in pts])
    assert (yaws >= 0).all() and (yaws <= 2 * np.pi + 1e-6).all()
    assert (np.abs(pitches) <= np.pi / 2 + 1e-6).all()
    # both hemispheres hit
    assert (pitches > 0.3).any() and (pitches < -0.3).any()


def test_camera_rig():
    rig = make_camera_rig(24, seed=1)
    assert len(rig) == 24
    radii = [v["radius"] for v in rig]
    assert min(radii) >= 1.8 and max(radii) <= 2.2


def test_blender_command_shape():
    cmd = blender_command(RenderJob("/x/obj.glb", "/out", num_views=8))
    assert cmd[0] == "blender" and "--background" in cmd
    assert "/x/obj.glb" in cmd and "8" in cmd


def test_device_pool_drains_queue():
    done = []

    def fake_run(job, wid):
        done.append((job.obj_path, wid))
        return {"obj": job.obj_path, "ok": True, "worker": wid}

    pool = DevicePool(num_workers=3, run_fn=fake_run)
    for i in range(10):
        pool.submit(RenderJob(f"obj{i}", "/tmp/out"))
    results = pool.run()
    assert len(results) == 10
    assert {r["obj"] for r in results} == {f"obj{i}" for i in range(10)}
    workers = {r["worker"] for r in results}
    assert workers <= {0, 1, 2}


def test_build_metadata(tmp_path):
    d = tmp_path / "renders" / "objA"
    d.mkdir(parents=True)
    (d / "0001.png").write_bytes(b"x")
    (d / "cameras.json").write_text("{}")
    meta = build_metadata(str(tmp_path / "renders"), str(tmp_path / "meta.json"))
    assert meta["count"] == 1
    assert meta["objects"][0]["num_images"] == 1
    assert meta["objects"][0]["has_cameras"]
    assert json.load(open(tmp_path / "meta.json"))["count"] == 1
