"""In-the-wild inference dataset.

Re-design of reference dataset/dataset_latent_inference.py:15-259: items come
from a manifest txt (`name canonical_frame_idx` per line, reference :36),
each with DINOv2 feature npz, canonical frame image + optional matte, and an
orbit-camera rig for rendering outputs (kiui-style orbit_camera :95-106 ->
representations/camera.orbit_camera here).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..representations.camera import orbit_camera


class InferenceDataset:
    def __init__(
        self,
        data_dir: str,
        manifest: Optional[str] = None,
        num_views: int = 128,
        resolution: int = 512,
        pitch_deg: float = 20.0,
        radius: float = 2.0,
    ):
        self.data_dir = data_dir
        self.num_views = num_views
        self.resolution = resolution
        self.pitch_deg = pitch_deg
        self.radius = radius
        manifest = manifest or os.path.join(data_dir, "in_the_wild.txt")
        self.items: List[Dict] = []
        if os.path.exists(manifest):
            with open(manifest) as f:
                for line in f:
                    parts = line.split()
                    if not parts:
                        continue
                    self.items.append({
                        "name": parts[0],
                        "canonical_idx": int(parts[1]) if len(parts) > 1 else 0,
                    })

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        it = self.items[idx]
        base = os.path.join(self.data_dir, it["name"])
        feats = np.load(os.path.join(base, "dinov2_features.npz"))["features"]
        entry = dict(it)
        entry["cond_images"] = feats.astype(np.float32)
        img_path = os.path.join(base, "canonical.png")
        if os.path.exists(img_path):
            import imageio

            entry["canonical_image"] = (
                np.asarray(imageio.imread(img_path)).astype(np.float32) / 255.0
            )
        mask_path = os.path.join(base, "canonical_mask.png")
        if os.path.exists(mask_path):
            import imageio

            entry["canonical_mask"] = (
                np.asarray(imageio.imread(mask_path)).astype(np.float32) / 255.0
            )
        return entry

    def cameras(self):
        """The output orbit rig for this dataset's render sweeps."""
        return [
            orbit_camera(
                360.0 * v / self.num_views, self.pitch_deg, radius=self.radius,
                height=self.resolution, width=self.resolution,
            )
            for v in range(self.num_views)
        ]
