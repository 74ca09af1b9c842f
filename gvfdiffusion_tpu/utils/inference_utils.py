"""Inference utilities: azimuth alignment, FPS sampling, render sweeps,
spiral videos.

Re-design of reference utils/inference_utils.py:
  - align_gaussian_to_canonical (:37-177): azimuth grid search rendering the
    canonical GS per angle and scoring L1 (+ optional CLIP-similarity via a
    caller-provided callback) against the video's canonical frame; scale
    factor from alpha bboxes; rotates GS xyz + quaternions. TPU-first: all
    `n_angles` candidate renders batch through ONE vmapped render call.
  - sample_gs (:180-208): FPS downsampling of a Gaussian set.
  - render_and_save_images (:209-306): T x V orbit sweep.
  - create_spiral_timeline_video (:308-381).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fps import fps_masked
from ..ops.quaternion import quat_multiply
from ..render.renderer import GaussianRenderer, RenderOptions
from ..representations.camera import orbit_camera
from ..representations.gaussians import GaussianSplat


def rotate_gaussians_z(gs: GaussianSplat, angle_rad: float | jnp.ndarray) -> GaussianSplat:
    """Rotate a splat set about the world z axis (azimuth)."""
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    xyz_w = gs.get_xyz  # [N, 3] world
    xyz_new = xyz_w @ rot.T
    # back to raw grid coords
    raw = (xyz_new - gs.aabb[:3]) / gs.aabb[3:]
    half = jnp.arctan2(s, c) / 2.0
    q_rot = jnp.stack([jnp.cos(half), 0.0 * c, 0.0 * c, jnp.sin(half)])
    new_q = quat_multiply(q_rot[None], gs.get_rotation) - gs._rots_bias
    return gs.replace(_xyz=raw, _rotation=new_q)


# jitted score programs keyed by (render options, V, res) — alignment calls
# score_at with a handful of distinct shapes, and re-tracing the 3 lax.map
# render programs on every call measured ~3x the device time on the
# tunneled backend (align_debug: stage A 736 ms eager vs 154 ms jitted).
_SCORE_CACHE: dict = {}


def _score_program(renderer: GaussianRenderer, n_views: int, res_h: int,
                   res_w: int, chunk: int = 8):
    key = (renderer.options, n_views, res_h, res_w, chunk)
    fn = _SCORE_CACHE.get(key)
    if fn is None:
        @jax.jit
        def fn(gs, valid, wvs, intr, tgt):
            out = renderer.render_views(
                gs, wvs, intr, res_h, res_w, valid=valid, chunk=chunk
            )
            l1 = jnp.mean(jnp.abs(out["render"] - tgt[None]), axis=(1, 2, 3))
            return l1, out["render"], out["alpha"]

        _SCORE_CACHE[key] = fn
    return fn


def align_gaussian_to_canonical(
    gs: GaussianSplat,
    target_image: jnp.ndarray,      # [H, W, 3] canonical video frame (white bg)
    target_alpha: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    n_angles: int = 360,
    renderer: Optional[GaussianRenderer] = None,
    clip_score_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    clip_weight: float = 0.2,
    camera_kwargs: Optional[dict] = None,
    coarse_res: int = 128,
    refine: int = 2,
    coarse_subset: Optional[int] = 65536,
    coarse_step: int = 5,
) -> Tuple[GaussianSplat, float, float]:
    """Find the azimuth (and alpha-bbox scale) aligning the generated GS to
    the video's canonical frame. Returns (aligned_gs, best_angle_rad, scale).

    TPU-first design vs the reference's 360 sequential CUDA renders
    (inference_utils.py:37-177, 1-degree grid):

      - Rotating the splats by theta equals rendering with the camera's
        world-view post-multiplied by Rz(theta), so every candidate is the
        SAME gaussian set viewed through a batched camera stack — one
        render_views program whose activation work is shared and whose
        angle axis is vmapped (no per-angle quaternion updates).
      - Hierarchical sweep: `coarse_step`-degree grid at `coarse_res`, then
        the 1-degree neighbourhood (+-coarse_step) still coarse, then the
        best +-`refine` at full target resolution. Exact whenever each
        stage's argmin lands within the next stage's neighbourhood — L1 vs
        a 128px target varies smoothly over 5 degrees (validated on the
        test scenes; set coarse_step=1 / coarse_res>=res to fall back to
        the exhaustive sweep).
      - Coarse stages score a top-`coarse_subset`-opacity subset: per-angle
        cost is projecting every gaussian, which resolution cannot reduce.
    """
    h, w = target_image.shape[:2]
    renderer = renderer or GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
        backend="binned", max_per_tile=128,
    ))
    angles = jnp.linspace(0.0, 2 * jnp.pi, n_angles, endpoint=False)
    cam0 = orbit_camera(0.0, 0.0, height=h, width=w, **(camera_kwargs or {}))

    def rot_z(a):
        c, s = jnp.cos(a), jnp.sin(a)
        z, o = jnp.zeros_like(c), jnp.ones_like(c)
        return jnp.stack([
            jnp.stack([c, -s, z, z], -1),
            jnp.stack([s, c, z, z], -1),
            jnp.stack([z, z, o, z], -1),
            jnp.stack([z, z, z, o], -1),
        ], -2)  # [..., 4, 4]

    def score_at(g, vld, angles_sub, res_h, res_w, tgt, collect_alpha):
        wvs = jnp.einsum("ij,ajk->aik", cam0.world_view, rot_z(angles_sub))
        prog = _score_program(renderer, int(angles_sub.shape[0]), res_h, res_w)
        intr = jnp.broadcast_to(
            cam0.intrinsics, (wvs.shape[0], 3, 3))
        l1, renders, alphas = prog(g, vld, wvs, intr, tgt)
        score = l1
        if clip_score_fn is not None:
            sim = jnp.asarray(clip_score_fn(np.asarray(renders)))
            score = l1 + clip_weight * (1.0 - sim)
        return score, (alphas if collect_alpha else None)

    # most-opaque subset for the coarse stages
    gs_c, valid_c = gs, valid
    if coarse_subset is not None and gs._xyz.shape[0] > coarse_subset:
        opa = gs.get_opacity[..., 0]
        if valid is not None:
            opa = jnp.where(valid, opa, -jnp.inf)
        _, top = jax.lax.top_k(opa, coarse_subset)
        gs_c = gs.replace(
            _xyz=gs._xyz[top], _features_dc=gs._features_dc[top],
            _scaling=gs._scaling[top], _rotation=gs._rotation[top],
            _opacity=gs._opacity[top],
        )
        valid_c = valid[top] if valid is not None else None

    two_stage = coarse_res < min(h, w)
    if two_stage:
        ch = max(coarse_res, 1)
        cw = max(int(round(coarse_res * w / h)), 1)
        tgt_c = jax.image.resize(target_image, (ch, cw, 3), "bilinear")
        step = max(int(coarse_step), 1)
        # stage A: coarse angle grid at coarse res
        idx_a = np.arange(0, n_angles, step)
        score_a, _ = score_at(gs_c, valid_c, angles[jnp.asarray(idx_a)],
                              ch, cw, tgt_c, False)
        a_best = int(idx_a[int(jnp.argmin(score_a))])
        # stage B: 1-degree neighbourhood, still coarse res
        if step > 1:
            idx_b = (np.arange(-(step - 1), step) + a_best) % n_angles
            score_b, _ = score_at(gs_c, valid_c, angles[jnp.asarray(idx_b)],
                                  ch, cw, tgt_c, False)
            c_best = int(idx_b[int(jnp.argmin(score_b))])
        else:
            c_best = a_best
        idx = (np.arange(-refine, refine + 1) + c_best) % n_angles
        cand = angles[jnp.asarray(idx)]
    else:
        cand = angles
        idx = np.arange(n_angles)
    fine_score, alphas = score_at(gs, valid, cand, h, w, target_image, True)
    best_local = int(jnp.argmin(fine_score))
    best = int(idx[best_local])
    best_angle = float(angles[best])

    # scale factor from alpha bounding boxes (reference :150-170)
    scale = 1.0
    if target_alpha is not None:
        ra = np.asarray(alphas[best_local]) > 0.5
        ta = np.asarray(target_alpha) > 0.5
        if ra.any() and ta.any():
            def extent(m):
                ys, xs = np.where(m)
                return max(ys.max() - ys.min(), xs.max() - xs.min())
            scale = float(extent(ta)) / max(float(extent(ra)), 1.0)

    aligned = rotate_gaussians_z(gs, jnp.float32(best_angle))
    if scale != 1.0:
        xyz = aligned.get_xyz * scale
        aligned = aligned.replace(
            _xyz=(xyz - aligned.aabb[:3]) / aligned.aabb[3:],
            _scaling=aligned._scaling + jnp.log(jnp.float32(scale)),
        )
    return aligned, best_angle, scale


def sample_gs(gs_activated: jnp.ndarray, valid: jnp.ndarray, num: int) -> jnp.ndarray:
    """FPS-downsample an activated [B, G, 14] Gaussian tensor -> [B, num, 14]
    (reference sample_gs :180-208)."""
    idx = jax.vmap(lambda p, v: fps_masked(p, v, num))(gs_activated[..., :3], valid)
    return jnp.take_along_axis(gs_activated, idx[..., None], axis=1)


def render_sweep(
    renderer: GaussianRenderer,
    gs: GaussianSplat,
    deltas: Optional[jnp.ndarray],  # [T, G, 14] or None for static
    valid: Optional[jnp.ndarray] = None,
    num_views: int = 128,
    resolution: int = 512,
    pitch_deg: float = 20.0,
    radius: float = 2.0,
    on_timestep=None,
) -> np.ndarray:
    """T x V orbit renders (reference render_and_save_images :209-306).

    TPU-first: each frame t runs ONE batched program over all V views
    (GaussianRenderer.render_views) — the delta application + activation are
    shared across views and the per-dispatch floor is paid once per frame,
    not once per (t, v) render like the reference's CUDA loop.

    on_timestep(t, frames_t): host callback invoked as each timestep's
    [V, H, W, 3] frames land — a StreamingVideoWriter here overlaps the mp4
    encode with the device rendering of the next timestep."""
    T = 1 if deltas is None else deltas.shape[0]
    cams = [
        orbit_camera(360.0 * v / num_views, pitch_deg, radius=radius,
                     height=resolution, width=resolution)
        for v in range(num_views)
    ]
    wvs = jnp.stack([c.world_view for c in cams])
    intr = cams[0].intrinsics

    @jax.jit
    def render_t(d):
        return renderer.render_views(
            gs, wvs, intr, resolution, resolution, delta=d, valid=valid,
        )["render"]

    render_static = jax.jit(lambda: renderer.render_views(
        gs, wvs, intr, resolution, resolution, valid=valid,
    )["render"])
    out = np.zeros((T, num_views, resolution, resolution, 3), np.float32)
    for t in range(T):
        if deltas is None:
            out[t] = np.asarray(render_static())
        else:
            out[t] = np.asarray(render_t(deltas[t]))
        if on_timestep is not None:
            on_timestep(t, out[t])
    return out


class StreamingVideoWriter:
    """Incremental mp4 writer on a background thread: the host x264/mp4v
    encode runs WHILE the device renders the next frames, instead of
    serialized after all device work (the round-4 full-driver wall was 41%
    idle-host video encode — reference utils/inference_utils.py:308-381 pays
    the same serialization).

    Frames are float [H, W, 3] in [0, 1] (or uint8). cv2 is the primary
    backend (present + fast in this image; imageio has no mp4 backend here);
    falls back to collecting frames for a .npy dump."""

    def __init__(self, path: str, fps: int = 15):
        import queue
        import threading

        self.path = path
        self.fps = fps
        self._q: "queue.Queue" = queue.Queue(maxsize=64)
        self._err = None
        self._fallback_frames = []
        self._vw = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @staticmethod
    def _to_u8(frame: np.ndarray) -> np.ndarray:
        if frame.dtype == np.uint8:
            return frame
        return (np.clip(frame, 0.0, 1.0) * 255).astype(np.uint8)

    def _run(self):
        try:
            import cv2
        except Exception as e:  # pragma: no cover - cv2 is in the image
            cv2 = None
            self._err = e
        while True:
            frame = self._q.get()
            if frame is None:
                break
            frame = self._to_u8(frame)
            if cv2 is not None and self._vw is None and self._err is None:
                h, w = frame.shape[:2]
                self._vw = cv2.VideoWriter(
                    self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps,
                    (w, h))
                if not self._vw.isOpened():
                    self._err = RuntimeError("cv2.VideoWriter failed to open")
                    self._vw = None
            if self._vw is not None:
                self._vw.write(frame[:, :, ::-1])  # RGB -> BGR
            else:
                self._fallback_frames.append(frame)
        if self._vw is not None:
            self._vw.release()

    def append(self, frame: np.ndarray) -> None:
        self._q.put(frame)

    def close(self) -> bool:
        """Flush + join; returns True if an mp4 was written."""
        self._q.put(None)
        self._thread.join()
        if self._err is not None or self._fallback_frames:
            if self._fallback_frames:
                np.save(self.path + ".npy", np.stack(self._fallback_frames))
            return False
        return True


def spiral_frame_indices(T: int, V: int, loops: int = 2):
    """The spiral timeline's (t, v) schedule (reference :308-381): view
    index sweeps the orbit while time advances, `loops` passes."""
    n = T * loops
    return [(t % T, (t * V // max(n, 1)) % V) for t in range(n)]


def create_spiral_timeline_video(
    frames: np.ndarray,  # [T, V, H, W, 3]
    path: str,
    fps: int = 15,
    loops: int = 2,
) -> bool:
    """Sweep the view index while time advances (reference :308-381).
    Returns True if an mp4 was written (cv2 backend — imageio ships no mp4
    encoder in this image; falls back to .npy)."""
    T, V = frames.shape[:2]
    w = StreamingVideoWriter(path, fps=fps)
    for t, v in spiral_frame_indices(T, V, loops):
        w.append(frames[t, v])
    return w.close()
