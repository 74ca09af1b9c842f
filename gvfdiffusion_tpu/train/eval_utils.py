"""Evaluation helpers: multiview snapshots + reconstruction metrics.

Re-design of the reference's eval-by-flag machinery (SURVEY.md §4.4-5):
periodic rendered-vs-GT image dumps (train_vae.py:231-240,276-285,336-346),
snapshot multiview eval (sparse_vae.py:384), and `encode_latent --debug`
PSNR (encode_latent.py:258-261, utils/script_util.py:97 psnr).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.ssim import psnr, ssim
from ..render.renderer import GaussianRenderer
from ..representations.camera import orbit_camera
from ..representations.gaussians import GaussianSplat


def reconstruction_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> Dict[str, float]:
    """PSNR/SSIM/L1 over [*, H, W, C] image stacks."""
    p = pred.reshape(-1, *pred.shape[-3:])
    t = target.reshape(-1, *target.shape[-3:])
    return {
        "psnr": float(psnr(p, t)),
        "ssim": float(ssim(p, t)),
        "l1": float(jnp.mean(jnp.abs(p - t))),
    }


def snapshot_multiview(
    renderer: GaussianRenderer,
    gs: GaussianSplat,
    valid: Optional[jnp.ndarray] = None,
    num_views: int = 4,
    resolution: int = 256,
    pitch_deg: float = 20.0,
    radius: float = 2.0,
) -> np.ndarray:
    """[V, H, W, 3] orbit snapshot grid (reference sparse_vae.py:384)."""
    out = []
    for v in range(num_views):
        cam = orbit_camera(
            360.0 * v / num_views, pitch_deg, radius=radius,
            height=resolution, width=resolution,
        )
        out.append(np.asarray(renderer.render(gs, cam, valid=valid)["render"]))
    return np.stack(out)


def dump_image_pairs(
    rendered: np.ndarray, target: np.ndarray, out_dir: str, step: int,
    prefix: str = "recon",
) -> str:
    """Side-by-side rendered|GT dumps every N steps (train_vae.py:231-240)."""
    os.makedirs(out_dir, exist_ok=True)
    r = np.clip(np.asarray(rendered), 0, 1)
    t = np.clip(np.asarray(target), 0, 1)
    pair = np.concatenate([r, t], axis=-2)  # side by side along width
    flat = pair.reshape(-1, *pair.shape[-3:])
    grid = np.concatenate(list(flat), axis=0)
    path = os.path.join(out_dir, f"{prefix}_{step:06d}.png")
    try:
        import imageio

        imageio.imwrite(path, (grid * 255).astype(np.uint8))
    except ImportError:
        path = path.replace(".png", ".npy")
        np.save(path, grid)
    return path
