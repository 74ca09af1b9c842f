"""Gaussian-splat representation as a JAX pytree.

Re-design of the reference GaussianModel
(representations/gaussian/gaussian_model.py:15-233): raw parameters
{_xyz, _features_dc, _scaling, _rotation, _opacity} with activation biases,
aabb denormalization, mip 3-D filter, and the delta-application contract
`get_*_with_delta` by which the 14-dim variation field animates the canonical
Gaussians (Δxyz[0:3], Δscale[3:6], Δrot[6:10], ΔSH[10:13], Δopacity[13:14] —
reference renderers/gaussian_render.py:154-160).

Being a flax.struct pytree, a GaussianSplat threads through jit/vmap/scan and
shards with jax.sharding — no host object graph.
"""

from __future__ import annotations


import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


def inverse_softplus(x):
    # log(e^x - 1): stable form x + log(1 - e^-x)
    return x + np.log(-np.expm1(-x))


@flax.struct.dataclass
class GaussianSplat:
    """Batched-or-flat Gaussian set: leading dims arbitrary, per-Gaussian:

    _xyz [..., 3] in [0,1] grid space; _features_dc [..., F, 3] SH DC (+rest);
    _scaling [..., 3]; _rotation [..., 4] (wxyz); _opacity [..., 1].
    """

    _xyz: jnp.ndarray
    _features_dc: jnp.ndarray
    _scaling: jnp.ndarray
    _rotation: jnp.ndarray
    _opacity: jnp.ndarray
    aabb: jnp.ndarray  # [6]: (x0, y0, z0, sx, sy, sz)
    # static config
    scaling_bias: float = flax.struct.field(pytree_node=False, default=0.01)
    opacity_bias: float = flax.struct.field(pytree_node=False, default=0.1)
    scaling_activation: str = flax.struct.field(pytree_node=False, default="exp")
    mininum_kernel_size: float = flax.struct.field(pytree_node=False, default=0.0)

    # -- activation helpers -------------------------------------------------

    @property
    def _scale_bias_raw(self) -> float:
        if self.scaling_activation == "exp":
            return float(np.log(self.scaling_bias))
        if self.scaling_activation == "softplus":
            return float(inverse_softplus(self.scaling_bias))
        raise ValueError(self.scaling_activation)

    def _activate_scaling(self, raw):
        if self.scaling_activation == "exp":
            s = jnp.exp(raw)
        else:
            s = jax.nn.softplus(raw)
        # mip 3D filter (reference gaussian_model.py:84-88)
        return jnp.sqrt(jnp.square(s) + self.mininum_kernel_size**2)

    @property
    def _opacity_bias_raw(self) -> float:
        return float(inverse_sigmoid(self.opacity_bias))

    @property
    def _rots_bias(self) -> jnp.ndarray:
        return jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)

    # -- activated getters ---------------------------------------------------

    @property
    def get_xyz(self):
        return self._xyz * self.aabb[3:] + self.aabb[:3]

    @property
    def get_scaling(self):
        return self._activate_scaling(self._scaling + self._scale_bias_raw)

    @property
    def get_rotation(self):
        r = self._rotation + self._rots_bias
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True)

    @property
    def get_opacity(self):
        return jax.nn.sigmoid(self._opacity + self._opacity_bias_raw)

    @property
    def get_features(self):
        return self._features_dc

    @property
    def num_gaussians(self) -> int:
        return self._xyz.shape[-2]

    # -- delta application (the variation-field contract) -------------------

    def _maybe_detach(self, x, detach):
        return jax.lax.stop_gradient(x) if detach else x

    def get_xyz_with_delta(self, delta, detach=False):
        return self._maybe_detach(self.get_xyz, detach) + delta

    def get_scaling_with_delta(self, delta, detach=False):
        raw = self._maybe_detach(self._scaling, detach) + self._scale_bias_raw + delta
        return self._activate_scaling(raw)

    def get_rotation_with_delta(self, delta, detach=False):
        r = self._maybe_detach(self._rotation, detach) + self._rots_bias + delta
        return r / jnp.linalg.norm(r, axis=-1, keepdims=True)

    def get_features_with_delta(self, delta, detach=False):
        return self._maybe_detach(self._features_dc, detach) + delta

    def get_opacity_with_delta(self, delta, detach=False):
        raw = self._maybe_detach(self._opacity, detach) + self._opacity_bias_raw + delta
        return jax.nn.sigmoid(raw)

    def apply_variation(self, delta: jnp.ndarray, detach_static: bool = False):
        """Apply a 14-dim per-Gaussian delta, returning activated attributes.

        delta [..., N, 14]: Δxyz | Δscale | Δrot | ΔSH-dc | Δopacity
        Returns dict(xyz, scaling, rotation, features, opacity).
        """
        return dict(
            xyz=self.get_xyz_with_delta(delta[..., 0:3], detach_static),
            scaling=self.get_scaling_with_delta(delta[..., 3:6], detach_static),
            rotation=self.get_rotation_with_delta(delta[..., 6:10], detach_static),
            features=self.get_features_with_delta(
                delta[..., None, 10:13], detach_static
            ),
            opacity=self.get_opacity_with_delta(delta[..., 13:14], detach_static),
        )

    # -- (de)serialization to the flat 14-dim activated form -----------------

    def to_activated_tensor(self) -> jnp.ndarray:
        """[..., N, 14] activated (xyz, scale, rot, dc, opacity) — the format
        the motion VAE consumes (reference train_vae.py get_gaussian_tensor)."""
        return jnp.concatenate(
            [
                self.get_xyz,
                self.get_scaling,
                self.get_rotation,
                self.get_features[..., 0, :],
                self.get_opacity,
            ],
            axis=-1,
        )


def from_activated(
    tensor: jnp.ndarray,
    aabb=(-0.5, -0.5, -0.5, 1.0, 1.0, 1.0),
    scaling_bias: float = 0.01,
    opacity_bias: float = 0.1,
    scaling_activation: str = "exp",
    mininum_kernel_size: float = 0.0,
) -> GaussianSplat:
    """Invert activations on a [..., N, 14] activated tensor -> GaussianSplat."""
    aabb = jnp.asarray(aabb, jnp.float32)
    xyz = (tensor[..., 0:3] - aabb[:3]) / aabb[3:]
    scaling = tensor[..., 3:6]
    if scaling_activation == "exp":
        raw_s = jnp.log(jnp.maximum(scaling, 1e-10)) - float(np.log(scaling_bias))
    else:
        s = jnp.maximum(scaling, 1e-6)
        raw_s = s + jnp.log(-jnp.expm1(-s)) - float(inverse_softplus(scaling_bias))
    rot = tensor[..., 6:10] - jnp.array([1.0, 0.0, 0.0, 0.0])
    feats = tensor[..., None, 10:13]
    op = jnp.clip(tensor[..., 13:14], 1e-6, 1 - 1e-6)
    raw_o = jnp.log(op / (1 - op)) - float(inverse_sigmoid(opacity_bias))
    return GaussianSplat(
        _xyz=xyz,
        _features_dc=feats,
        _scaling=raw_s,
        _rotation=rot,
        _opacity=raw_o,
        aabb=aabb,
        scaling_bias=scaling_bias,
        opacity_bias=opacity_bias,
        scaling_activation=scaling_activation,
        mininum_kernel_size=mininum_kernel_size,
    )
