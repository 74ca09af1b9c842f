"""LPIPS perceptual loss (VGG16 backbone) in flax.

Re-design of the reference's vendored LPIPS (utils/lpips/{lpips,networks}.py:
VGG16 slices relu1_2/2_2/3_3/4_3/5_3, unit-normalize channels, 1x1 linear
heads, spatial mean, sum over layers). Weights convert from the torch
vgg16+lin checkpoints via `convert_torch_lpips`; without a weights file the
loss factory returns None and callers skip the LPIPS term (this image has no
network access to fetch them).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; relu slices after each
_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        ci = 0
        for si, (ch, n_convs) in enumerate(_STAGES):
            for j in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{ci}")(x)
                x = nn.relu(x)
                ci += 1
            feats.append(x)
            if si < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """[B, H, W, 3] pairs in [0, 1] -> per-sample LPIPS distance [B]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        def norm_input(img):
            img = img * 2.0 - 1.0  # [0,1] -> [-1,1]
            return (img - _SHIFT) / _SCALE

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(norm_input(x))
        fy = vgg(norm_input(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.ones, (d.shape[-1],)
            )
            # linear 1x1 head (reference utils/lpips/networks.py:23-30 —
            # released weights are non-negative; no abs, exact linearity)
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total


def load_lpips(weights_path: Optional[str]) -> Optional[Callable]:
    """Returns lpips_fn(x, y) -> [B] or None if no weights available."""
    if not weights_path:
        return None
    import os

    if not os.path.exists(weights_path):
        return None
    data = np.load(weights_path)
    params = {"params": _unflatten({k: data[k] for k in data.files})}
    model = LPIPS()

    def fn(x, y):
        return model.apply(jax.tree.map(jnp.asarray, params), x, y)

    return fn


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_torch_lpips(vgg_state: Dict[str, np.ndarray],
                        lin_state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torchvision vgg16.features + LPIPS lin heads -> flat npz dict.

    vgg_state keys: features.{idx}.weight/bias (conv idxs 0,2,5,7,10,...)
    lin_state keys: lin{i}.model.1.weight [1, C, 1, 1]
    """
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for ci, ti in enumerate(conv_idx):
        w = np.asarray(vgg_state[f"features.{ti}.weight"])  # [o,i,3,3]
        out[f"vgg/conv{ci}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"vgg/conv{ci}/bias"] = np.asarray(vgg_state[f"features.{ti}.bias"])
    for i in range(5):
        w = np.asarray(lin_state[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        out[f"lin{i}"] = w.reshape(-1)
    return out
