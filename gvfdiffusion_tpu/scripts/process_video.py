"""In-the-wild video preprocessing: frames -> masks -> DINOv2 features.

Re-designs the reference's in-the-wild driver chain (scripts/run_in_the_wild.sh
:14-39, which references a MISSING scripts/process_in_the_wild_video.py —
SURVEY.md §7.4 flags this; here the frame extractor exists):

  1. extract frames with ffmpeg (or imageio fallback)
  2. matting: caller-provided model (MODNet/rembg are external networks);
     alpha-threshold fallback for pre-matted inputs
  3. normalize to 380-content/512-canvas like
     scripts/encode_in_the_wild_img_cond_dinov2_feature.py:27-142
  4. DINOv2 per-frame x_prenorm tokens -> npz
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
from typing import Callable, Optional

import numpy as np


def extract_frames(video_path: str, out_dir: str, fps: int = 8,
                   max_frames: int = 32) -> int:
    """ffmpeg frame extraction; returns frame count."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-i", video_path, "-vf", f"fps={fps}",
             "-frames:v", str(max_frames),
             os.path.join(out_dir, "frame_%04d.png")],
            check=True, capture_output=True,
        )
    except (FileNotFoundError, subprocess.CalledProcessError):
        import imageio

        reader = imageio.get_reader(video_path)
        for i, frame in enumerate(reader):
            if i >= max_frames:
                break
            imageio.imwrite(os.path.join(out_dir, f"frame_{i:04d}.png"), frame)
    return len(glob.glob(os.path.join(out_dir, "frame_*.png")))


def normalize_frame(
    image: np.ndarray, alpha: Optional[np.ndarray] = None,
    content_size: int = 380, canvas_size: int = 512,
) -> np.ndarray:
    """Center the masked object at content_size inside a white canvas_size
    square (reference encode_in_the_wild_*:27-142)."""
    import jax
    import jax.numpy as jnp

    img = image.astype(np.float32)
    if img.max() > 1.5:
        img /= 255.0
    if alpha is None:
        alpha = img[..., 3] if img.shape[-1] == 4 else np.ones(img.shape[:2], np.float32)
    rgb = img[..., :3]
    ys, xs = np.where(alpha > 0.5)
    if len(ys) == 0:
        ys, xs = np.arange(img.shape[0]), np.arange(img.shape[1])
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    crop = rgb[y0:y1, x0:x1] * alpha[y0:y1, x0:x1, None] + (
        1.0 - alpha[y0:y1, x0:x1, None]
    )
    h, w = crop.shape[:2]
    s = content_size / max(h, w)
    nh, nw = int(round(h * s)), int(round(w * s))
    resized = np.asarray(
        jax.image.resize(jnp.asarray(crop), (nh, nw, 3), "bilinear")
    )
    canvas = np.ones((canvas_size, canvas_size, 3), np.float32)
    oy, ox = (canvas_size - nh) // 2, (canvas_size - nw) // 2
    canvas[oy : oy + nh, ox : ox + nw] = resized
    return canvas


def encode_video_features(
    frames_dir: str, out_path: str,
    dinov2=None, dinov2_params=None,
    matting_fn: Optional[Callable] = None,
    image_size: int = 518,
) -> np.ndarray:
    """Per-frame DINOv2 tokens -> npz {'features': [T, L, C]}."""
    import imageio
    import jax
    import jax.numpy as jnp

    from ..models.dinov2 import DinoV2, encode_image

    paths = sorted(glob.glob(os.path.join(frames_dir, "frame_*.png")))
    if not paths:
        raise FileNotFoundError(f"no frames in {frames_dir}")
    if dinov2 is None:
        dinov2 = DinoV2()
    frames = []
    for p in paths:
        img = np.asarray(imageio.imread(p))
        alpha = matting_fn(img) if matting_fn else None
        canvas = normalize_frame(img, alpha)
        canvas = np.asarray(
            jax.image.resize(jnp.asarray(canvas), (image_size, image_size, 3),
                             "bilinear")
        )
        frames.append(canvas)
    batch = jnp.asarray(np.stack(frames))
    if dinov2_params is None:
        dinov2_params = dinov2.init(jax.random.PRNGKey(0), batch[:1])
    feats = np.asarray(encode_image(dinov2, dinov2_params, batch))
    np.savez(out_path, features=feats.astype(np.float32))
    return feats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--max_frames", type=int, default=32)
    args = p.parse_args(argv)
    frames_dir = os.path.join(args.out_dir, "frames")
    n = extract_frames(args.video, frames_dir, args.fps, args.max_frames)
    print(f"extracted {n} frames")
    feats = encode_video_features(
        frames_dir, os.path.join(args.out_dir, "dinov2_features.npz")
    )
    print(f"features {feats.shape}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
