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
) -> Tuple[GaussianSplat, float, float]:
    """Find the azimuth (and alpha-bbox scale) aligning the generated GS to
    the video's canonical frame. Returns (aligned_gs, best_angle_rad, scale).

    Coarse-to-fine: the 360-candidate sweep (reference inference_utils.py:52,
    1-degree grid) is scored at `coarse_res` (blend cost scales with pixels,
    ~16x cheaper at 128 vs 512), then the best +-`refine` neighbours are
    re-scored at full target resolution. Exact for any scoring function
    whose coarse argmin lands within `refine` grid steps of the full-res
    argmin; set coarse_res >= target res to disable.
    """
    h, w = target_image.shape[:2]
    renderer = renderer or GaussianRenderer(RenderOptions(
        near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
        backend="binned", max_per_tile=128,
    ))
    angles = jnp.linspace(0.0, 2 * jnp.pi, n_angles, endpoint=False)

    def score_at(angles_sub, res_h, res_w, tgt, collect_alpha):
        cam = orbit_camera(
            0.0, 0.0, height=res_h, width=res_w, **(camera_kwargs or {})
        )

        def render_at(angle):
            g = rotate_gaussians_z(gs, angle)
            out = renderer.render(g, cam, valid=valid)
            return out["render"], out["alpha"]

        renders, alphas = jax.lax.map(render_at, angles_sub, batch_size=8)
        l1 = jnp.mean(jnp.abs(renders - tgt[None]), axis=(1, 2, 3))
        score = l1
        if clip_score_fn is not None:
            sim = jnp.asarray(clip_score_fn(np.asarray(renders)))
            score = l1 + clip_weight * (1.0 - sim)
        return score, (alphas if collect_alpha else None)

    two_stage = coarse_res < min(h, w)
    if two_stage:
        ch = max(coarse_res, 1)
        cw = max(int(round(coarse_res * w / h)), 1)
        tgt_c = jax.image.resize(target_image, (ch, cw, 3), "bilinear")
        # coarse scoring over a most-opaque subset: per-angle cost is
        # dominated by rotating + projecting EVERY gaussian (~1M after the
        # SLat decode), which resolution cannot reduce
        gs_all, valid_all = gs, valid
        if (coarse_subset is not None
                and gs._xyz.shape[0] > coarse_subset):
            opa = gs.get_opacity[..., 0]
            if valid is not None:
                opa = jnp.where(valid, opa, -jnp.inf)
            _, top = jax.lax.top_k(opa, coarse_subset)
            gs = gs.replace(
                _xyz=gs._xyz[top], _features_dc=gs._features_dc[top],
                _scaling=gs._scaling[top], _rotation=gs._rotation[top],
                _opacity=gs._opacity[top],
            )
            valid = valid[top] if valid is not None else None
        coarse_score, _ = score_at(angles, ch, cw, tgt_c, False)
        gs, valid = gs_all, valid_all
        c_best = int(jnp.argmin(coarse_score))
        idx = (np.arange(-refine, refine + 1) + c_best) % n_angles
        cand = angles[jnp.asarray(idx)]
    else:
        cand = angles
        idx = np.arange(n_angles)
    fine_score, alphas = score_at(cand, h, w, target_image, True)
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
) -> np.ndarray:
    """T x V orbit renders (reference render_and_save_images :209-306)."""
    T = 1 if deltas is None else deltas.shape[0]
    cams = [
        orbit_camera(360.0 * v / num_views, pitch_deg, radius=radius,
                     height=resolution, width=resolution)
        for v in range(num_views)
    ]
    render = jax.jit(
        lambda d, wv, intr: renderer.render(
            gs, cams[0].replace(world_view=wv, intrinsics=intr),
            delta=d, valid=valid,
        )["render"]
    )
    zero_delta = None if deltas is None else deltas[0] * 0
    out = np.zeros((T, num_views, resolution, resolution, 3), np.float32)
    for t in range(T):
        d = None if deltas is None else deltas[t]
        for v, cam in enumerate(cams):
            if deltas is None:
                out[t, v] = np.asarray(
                    renderer.render(gs, cam, valid=valid)["render"]
                )
            else:
                out[t, v] = np.asarray(render(d, cam.world_view, cam.intrinsics))
    return out


def create_spiral_timeline_video(
    frames: np.ndarray,  # [T, V, H, W, 3]
    path: str,
    fps: int = 15,
    loops: int = 2,
) -> bool:
    """Sweep the view index while time advances (reference :308-381).
    Returns True if an mp4 was written (imageio available)."""
    T, V = frames.shape[:2]
    n = T * loops
    seq = [
        frames[t % T, (t * V // max(n, 1)) % V] for t in range(n)
    ]
    arr = (np.clip(np.stack(seq), 0, 1) * 255).astype(np.uint8)
    try:
        import imageio

        imageio.mimsave(path, arr, fps=fps)
        return True
    except Exception:
        np.save(path + ".npy", arr)
        return False
