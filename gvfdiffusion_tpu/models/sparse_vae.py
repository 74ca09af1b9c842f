"""SparseVAE framework: sparse voxel features -> Gaussian splats -> render
losses.

Re-design of the reference SparseVAE (model/sparse_voxel_diffusion/
sparse_vae.py:60-485): per-voxel 8-Gaussian layout ({_xyz, _features_dc,
_scaling, _rotation, _opacity} x 8 = 112 channels, `_calc_layout` :202),
voxel-center + tanh-bounded offsets with Hammersley perturbation
(`to_representation` :114-182, `_build_perturbation` :104), render losses
L1 + SSIM + LPIPS + KL + volume/opacity regularizers (:303-362).

TPU-first: no per-sample Python loops — the whole batch maps to one padded
GaussianSplat [B, L*G, ...] pytree and a vmapped differentiable render.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..representations.gaussians import GaussianSplat
from ..sparse.tensor import SparseVoxels


def halton(index: int, base: int) -> float:
    f, r = 1.0, 0.0
    i = index
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def hammersley_sequence(dim: int, n: int, num_samples: int):
    """(reference model/sparse_voxel_diffusion/utils.py:78)."""
    primes = [2, 3, 5, 7, 11]
    return [n / num_samples] + [halton(n, primes[d]) for d in range(dim - 1)]


class GSConfig(NamedTuple):
    """MipGS representation config (configs/diffusion.yml:60-77)."""

    num_gaussians: int = 8
    voxel_size: float = 1.5
    scaling_bias: float = 0.004
    opacity_bias: float = 0.1
    scaling_activation: str = "softplus"
    filter_2d_kernel_size: float = 0.1
    filter_3d_kernel_size: float = 0.0009
    perturb_offset: bool = True
    reg_mode: str = "soft_invoxel"
    lr_xyz: float = 1.0
    lr_features_dc: float = 1.0
    lr_opacity: float = 1.0
    lr_scaling: float = 1.0
    lr_rotation: float = 0.1

    @property
    def out_channels(self) -> int:
        return self.num_gaussians * 14


def build_perturbation(cfg: GSConfig) -> np.ndarray:
    """atanh Hammersley offsets [G, 3] (reference sparse_vae.py:104-112)."""
    g = cfg.num_gaussians
    offsets = np.array([hammersley_sequence(3, i, g) for i in range(g)]) - 0.5
    if cfg.reg_mode == "soft_invoxel":
        offsets = offsets / 0.5 / cfg.voxel_size
    return np.arctanh(np.clip(offsets, -0.999999, 0.999999)).astype(np.float32)


def to_representation(
    x: SparseVoxels, cfg: GSConfig = GSConfig(), resolution: Optional[int] = None
):
    """Network output [B, L, G*14] -> (GaussianSplat [B, L*G, ...], valid [B, L*G]).

    Channel layout per voxel (reference _calc_layout sparse_vae.py:202-216):
    xyz-offsets [G*3] | features_dc [G*3] | scaling [G*3] | rotation [G*4]
    | opacity [G].
    """
    res = resolution or x.resolution
    g = cfg.num_gaussians
    b, l, _ = x.feats.shape
    f = x.feats
    o = 0

    def take(n, shape):
        nonlocal o
        out = f[..., o : o + g * n].reshape(b, l, g, *shape)
        o += g * n
        return out

    off = take(3, (3,)) * cfg.lr_xyz
    feats_dc = take(3, (1, 3)) * cfg.lr_features_dc
    scaling = take(3, (3,)) * cfg.lr_scaling
    rotation = take(4, (4,)) * cfg.lr_rotation
    opacity = take(1, (1,)) * cfg.lr_opacity

    if cfg.perturb_offset:
        off = off + jnp.asarray(build_perturbation(cfg))
    if cfg.reg_mode == "invoxel":
        off = jnp.tanh(off) / res
    elif cfg.reg_mode == "soft_invoxel":
        off = jnp.tanh(off) / res * 0.5 * cfg.voxel_size
    else:
        raise ValueError(cfg.reg_mode)

    center = (x.coords.astype(jnp.float32) + 0.5) / res  # [B, L, 3] in [0,1]
    xyz = center[:, :, None, :] + off  # [B, L, G, 3]

    flat = lambda a: a.reshape(b, l * g, *a.shape[3:])
    gs = GaussianSplat(
        _xyz=flat(xyz),
        _features_dc=flat(feats_dc),
        _scaling=flat(scaling),
        _rotation=flat(rotation),
        _opacity=flat(opacity),
        aabb=jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32),
        scaling_bias=cfg.scaling_bias,
        opacity_bias=cfg.opacity_bias,
        scaling_activation=cfg.scaling_activation,
        mininum_kernel_size=cfg.filter_3d_kernel_size,
    )
    valid = jnp.repeat(x.valid, g, axis=1)
    return gs, valid


def regularization_losses(
    gs: GaussianSplat, valid: jnp.ndarray,
    lambda_vol: float = 10000.0, lambda_opacity: float = 0.001,
) -> Dict[str, jnp.ndarray]:
    """Volume + opacity regularizers (reference sparse_vae.py:229-249)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    vol = jnp.prod(gs.get_scaling, axis=-1)  # [B, N]
    reg_vol = jnp.sum(vol * w) / n
    op = gs.get_opacity[..., 0]
    reg_op = jnp.sum(((op - 1.0) ** 2) * w) / n
    return {
        "reg_vol": reg_vol,
        "reg_opacity": reg_op,
        "loss": lambda_vol * reg_vol + lambda_opacity * reg_op,
    }


def kl_loss(mean: jnp.ndarray, logvar: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Diagonal-Gaussian KL to N(0, I), averaged over valid voxels."""
    per = 0.5 * jnp.sum(mean**2 + jnp.exp(logvar) - 1.0 - logvar, axis=-1)
    w = valid.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(w.sum(), 1.0)
