"""The complete in-the-wild video -> 4D pipeline.

Composes the full reference call stack (SURVEY.md §3.1,
inference_dpm_latent.py:41-273):

  1. TRELLIS image->3D on the canonical frame -> canonical GaussianSplat
  2. azimuth alignment of the generated GS to the video's canonical frame
     (utils/inference_utils.align_gaussian_to_canonical)
  3. FPS sampling of conditioning anchors (sample_gs)
  4. CFG-wrapped DPM-Solver++ sampling of the deformation latent
  5. motion-VAE decode -> per-frame 14-dim deltas
  6. orbit-sweep rendering + spiral timeline video

Stages 1/4/5 are jit-compiled device programs; 2/3/6 mix host orchestration
with vmapped device renders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..render.renderer import GaussianRenderer, RenderOptions
from ..utils.inference_utils import (
    align_gaussian_to_canonical, render_sweep,
    sample_gs,
)
from .trellis_image_to_3d import TrellisImageTo3DPipeline
from .video_to_4d import VideoTo4DPipeline


@dataclasses.dataclass
class InTheWildConfig:
    num_latents: int = 512
    align_n_angles: int = 360        # 1-degree grid for wild inputs
    align_synthetic_angles: int = 4  # 90-degree grid for synthetic inputs
    render_views: int = 128
    render_resolution: int = 512
    max_gaussians: int = 32768       # static padding capacity


class InTheWildPipeline:
    def __init__(
        self,
        trellis: TrellisImageTo3DPipeline,
        video_to_4d: VideoTo4DPipeline,
        config: Optional[InTheWildConfig] = None,
        clip_score_fn: Optional[Callable] = None,
        render_options: Optional[RenderOptions] = None,
    ):
        self.trellis = trellis
        self.v4d = video_to_4d
        self.cfg = config or InTheWildConfig()
        self.clip_score_fn = clip_score_fn
        self.renderer = GaussianRenderer(render_options or RenderOptions())

    def run(
        self,
        canonical_image: np.ndarray,     # [H, W, 3|4] the video's canonical frame
        cond_images: jnp.ndarray,        # [T, L, 1024] DINOv2 video tokens
        rng: jax.Array,
        canonical_alpha: Optional[np.ndarray] = None,
        synthetic: bool = False,
        align: bool = True,
    ) -> Dict[str, Any]:
        k1, k2 = jax.random.split(rng)

        # 1. canonical 3D generation
        trellis_out = self.trellis.run(canonical_image, k1)
        gs_batched, valid = trellis_out["gaussians"], trellis_out["valid"]
        gs = jax.tree.map(
            lambda a: a[0] if hasattr(a, "ndim") and a.ndim > 1 else a, gs_batched
        )
        valid0 = valid[0]

        # 2. azimuth alignment against the canonical video frame
        angle, scale = 0.0, 1.0
        if align:
            n_angles = (
                self.cfg.align_synthetic_angles if synthetic
                else self.cfg.align_n_angles
            )
            target = jnp.asarray(
                self.trellis.preprocess_image(canonical_image)
            )
            h = self.renderer.options
            target = jax.image.resize(
                target, (self.cfg.render_resolution, self.cfg.render_resolution, 3),
                "bilinear",
            )
            gs, angle, scale = align_gaussian_to_canonical(
                gs, target,
                target_alpha=canonical_alpha,
                valid=valid0,
                n_angles=n_angles,
                renderer=self.renderer,
                clip_score_fn=self.clip_score_fn,
            )

        # 3-5. deformation sampling + decode (pads GS to static capacity)
        activated = gs.to_activated_tensor()[None]  # [1, G, 14]
        out = self.v4d.run(activated, valid0[None], cond_images[None], k2)

        return {
            "gaussians": gs,
            "valid": valid0,
            "align_angle": angle,
            "align_scale": scale,
            "latent": out["latent"],
            "deltas": out["deltas"],
            "anchors": out["anchors"],
        }

    def render_outputs(
        self, result: Dict[str, Any], out_dir: str, fps: int = 15
    ) -> np.ndarray:
        """Stage 6: orbit sweep + spiral video (render_and_save_images +
        create_spiral_timeline_video parity)."""
        import os

        from ..utils.inference_utils import (
            StreamingVideoWriter, spiral_frame_indices,
        )

        os.makedirs(out_dir, exist_ok=True)
        deltas = result["deltas"][0]
        T, V = deltas.shape[0], self.cfg.render_views
        # stream each timestep's frames to the encoder thread as the device
        # renders the next one: the host mp4 encode rides under device time
        # instead of serializing after it (VERDICT r4 item 2)
        writer = StreamingVideoWriter(os.path.join(out_dir, "spiral.mp4"),
                                      fps=fps)
        schedule = spiral_frame_indices(T, V)
        by_t: dict = {}
        for i, (t, v) in enumerate(schedule):
            by_t.setdefault(t, []).append((i, v))
        pending: dict = {}
        next_i = 0

        def on_timestep(t, frames_t):
            nonlocal next_i
            for i, v in by_t.get(t, ()):
                pending[i] = frames_t[v]
            while next_i in pending:
                writer.append(pending.pop(next_i))
                next_i += 1

        frames = render_sweep(
            self.renderer, result["gaussians"], deltas,
            valid=result["valid"], num_views=V,
            resolution=self.cfg.render_resolution,
            on_timestep=on_timestep,
        )
        writer.close()
        np.save(os.path.join(out_dir, "frames.npy"), frames)
        return frames
