"""Offline 4D rendering orchestration (host-side).

Re-design of the reference's data_rendering/ stack (render.py:28 GPU-pool
process workers, blender_new.py headless Blender invocations, Objaverse
download handlers, build_metadata.py): a device-pool work queue that shells
out to Blender per object, camera-rig generation with the same
sphere-Hammersley randomization family, and a metadata builder. Blender
itself is external (not in this image) — the orchestration, rig math, and
manifest plumbing are what the framework owns.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import queue
import subprocess
import threading
from typing import Callable, Dict, List, Optional

import numpy as np


# -- camera rigs -------------------------------------------------------------


def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    while index > 0:
        f /= base
        r += f * (index % base)
        index //= base
    return r


def sphere_hammersley_sequence(n: int, num_samples: int, offset=(0.0, 0.0)):
    """(yaw, pitch) low-discrepancy sphere points (reference
    data_rendering/utils.py:36-44)."""
    u = n / num_samples + offset[0] / num_samples
    v = halton(n, 2) + offset[1]
    theta = math.acos(max(-1.0, min(1.0, 1 - 2 * u))) - math.pi / 2
    phi = (v % 1.0) * 2 * math.pi
    return phi, theta


def make_camera_rig(num_views: int, radius: float = 2.0, seed: int = 0):
    """num_views (yaw, pitch, radius, fov) tuples with light randomization."""
    rng = np.random.default_rng(seed)
    views = []
    offset = (float(rng.uniform(0, 1)), float(rng.uniform(0, 1)))
    for i in range(num_views):
        yaw, pitch = sphere_hammersley_sequence(i, num_views, offset)
        views.append(dict(
            yaw=yaw, pitch=pitch,
            radius=radius * float(rng.uniform(0.9, 1.1)),
            fov=math.radians(40 + float(rng.uniform(-5, 5))),
        ))
    return views


# -- work pool ---------------------------------------------------------------


@dataclasses.dataclass
class RenderJob:
    obj_path: str
    out_dir: str
    num_views: int = 24
    num_frames: int = 24
    seed: int = 0
    gpu_id: int = 0
    resolution: int = 512
    mode_multi: bool = False
    mode_static: bool = False
    mode_front: bool = True
    mode_four_view: bool = False
    augment: bool = False
    overwrite: bool = False


def blender_command(job: RenderJob, blender: str = "blender",
                    script: Optional[str] = None) -> List[str]:
    """Headless Blender invocation of data_rendering/blender_script.py
    (reference render.py:38-55 builds the same shape of command around
    blender_new.py, one process per GPU-pool worker)."""
    script = script or os.path.join(os.path.dirname(__file__), "blender_script.py")
    cmd = [
        blender, "--background", "--python", script, "--",
        "--object_path", job.obj_path, "--output_dir", job.out_dir,
        "--view_num", str(job.num_views), "--frame_num", str(job.num_frames),
        "--seed", str(job.seed), "--gpu_id", str(job.gpu_id),
        "--resolution", str(job.resolution),
        "--mode_multi", str(int(job.mode_multi)),
        "--mode_static", str(int(job.mode_static)),
        "--mode_front", str(int(job.mode_front)),
        "--mode_four_view", str(int(job.mode_four_view)),
    ]
    if job.augment:
        cmd.append("--augment")
    if job.overwrite:
        cmd.append("--overwrite")
    return cmd


class DevicePool:
    """N worker threads, each pinned to a device slot, draining a job queue
    (reference render.py:28's GPU-pool process workers)."""

    def __init__(self, num_workers: int, run_fn: Optional[Callable] = None):
        self.num_workers = num_workers
        self.run_fn = run_fn or self._run_blender
        self._q: "queue.Queue[RenderJob]" = queue.Queue()
        self.results: List[Dict] = []
        self._lock = threading.Lock()

    def _run_blender(self, job: RenderJob, worker_id: int) -> Dict:
        env = dict(os.environ, CUDA_VISIBLE_DEVICES=str(worker_id))
        try:
            proc = subprocess.run(
                blender_command(job), env=env, capture_output=True, timeout=3600
            )
            ok = proc.returncode == 0
        except (FileNotFoundError, subprocess.TimeoutExpired):
            ok = False
        return {"obj": job.obj_path, "ok": ok, "worker": worker_id}

    def submit(self, job: RenderJob) -> None:
        self._q.put(job)

    def run(self) -> List[Dict]:
        def worker(wid: int):
            while True:
                try:
                    job = self._q.get_nowait()
                except queue.Empty:
                    return
                res = self.run_fn(job, wid)
                with self._lock:
                    self.results.append(res)
                self._q.task_done()

        threads = [
            threading.Thread(target=worker, args=(i,), daemon=True)
            for i in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return self.results


# -- metadata ----------------------------------------------------------------


def build_metadata(render_root: str, out_path: Optional[str] = None) -> Dict:
    """Scan rendered outputs into a manifest (reference build_metadata.py)."""
    entries = []
    if os.path.isdir(render_root):
        for name in sorted(os.listdir(render_root)):
            d = os.path.join(render_root, name)
            if not os.path.isdir(d):
                continue
            frames = [f for f in os.listdir(d) if f.endswith((".png", ".exr"))]
            cams = os.path.join(d, "cameras.json")
            entries.append({
                "name": name,
                "num_images": len(frames),
                "has_cameras": os.path.exists(cams),
            })
    meta = {"root": render_root, "objects": entries, "count": len(entries)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(meta, f, indent=2)
    return meta
