"""Space-filling-curve codes for sparse-voxel serialization.

TPU-native replacement for the reference's vox2seq CUDA extension
(reference: model/sparse_voxel_diffusion/vox2seq/src/{z_order.cu,hilbert.cu},
API at vox2seq/vox2seq/__init__.py:9,31). Integer bit manipulation vectorizes
perfectly on the VPU, so these are plain jitted jnp int32 ops — no Pallas
needed. Used by serialized sparse attention (see sparse/attention.py) to order
voxels along a 1-D locality-preserving curve.

Coordinates are 10-bit unsigned ints (0..1023); codes are 30-bit, stored in
int32. The Hilbert transform is Skilling's public-domain algorithm
("Programming the Hilbert curve", AIP 2004), fully unrolled over the 10
static bit levels so XLA sees straight-line vector code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BITS = 10  # 10 bits per axis -> 1024^3 grid, 30-bit codes


def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so bit i lands at position 3*i."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _compact1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _part1by2: gather every 3rd bit back into the low 10 bits."""
    v = v & 0x09249249
    v = (v | (v >> 2)) & 0x030C30C3
    v = (v | (v >> 4)) & 0x0300F00F
    v = (v | (v >> 8)) & 0x030000FF
    v = (v | (v >> 16)) & 0x000003FF
    return v


@jax.jit
def z_order_encode(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Morton (Z-order) code: interleave bits as ... z1 y1 x1 z0 y0 x0."""
    x = x.astype(jnp.int32)
    y = y.astype(jnp.int32)
    z = z.astype(jnp.int32)
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


@jax.jit
def z_order_decode(code: jnp.ndarray):
    """Inverse of z_order_encode -> (x, y, z)."""
    code = code.astype(jnp.int32)
    return _compact1by2(code), _compact1by2(code >> 1), _compact1by2(code >> 2)


def _axes_to_transpose(x0, x1, x2, bits: int):
    """Skilling forward transform: axes -> transposed Hilbert coordinates."""
    m = 1 << (bits - 1)
    q = m
    while q > 1:
        p = q - 1
        for xi_idx in range(3):
            xs = [x0, x1, x2]
            xi = xs[xi_idx]
            cond = (xi & q) != 0
            t = (x0 ^ xi) & p
            new_x0 = jnp.where(cond, x0 ^ p, x0 ^ t)
            new_xi = jnp.where(cond, xi, xi ^ t)
            if xi_idx == 0:
                x0 = jnp.where(cond, x0 ^ p, x0)  # i==0: t is 0 by construction
            else:
                x0 = new_x0
                xs[xi_idx] = new_xi
                x1, x2 = xs[1], xs[2]
        q >>= 1
    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x0)
    q = m
    while q > 1:
        t = jnp.where((x2 & q) != 0, t ^ (q - 1), t)
        q >>= 1
    return x0 ^ t, x1 ^ t, x2 ^ t


def _transpose_to_axes(x0, x1, x2, bits: int):
    """Skilling inverse transform: transposed Hilbert coordinates -> axes."""
    n = 2 << (bits - 1)
    # Gray decode
    t = x2 >> 1
    x2 = x2 ^ x1
    x1 = x1 ^ x0
    x0 = x0 ^ t
    # Undo excess work
    q = 2
    while q != n:
        p = q - 1
        for xi_idx in (2, 1, 0):
            xs = [x0, x1, x2]
            xi = xs[xi_idx]
            cond = (xi & q) != 0
            t = (x0 ^ xi) & p
            if xi_idx == 0:
                x0 = jnp.where(cond, x0 ^ p, x0)
            else:
                new_x0 = jnp.where(cond, x0 ^ p, x0 ^ t)
                new_xi = jnp.where(cond, xi, xi ^ t)
                x0 = new_x0
                xs[xi_idx] = new_xi
                x1, x2 = xs[1], xs[2]
        q <<= 1
    return x0, x1, x2


@functools.partial(jax.jit, static_argnames=("bits",))
def hilbert_encode(x, y, z, bits: int = BITS) -> jnp.ndarray:
    """Hilbert-curve index of 3-D integer coordinates (bit-interleaved)."""
    x = x.astype(jnp.int32)
    y = y.astype(jnp.int32)
    z = z.astype(jnp.int32)
    h0, h1, h2 = _axes_to_transpose(x, y, z, bits)
    # Interleave transposed bits, MSB first, axis 0 most significant per level.
    code = jnp.zeros_like(x)
    for b in range(bits - 1, -1, -1):
        code = (code << 1) | ((h0 >> b) & 1)
        code = (code << 1) | ((h1 >> b) & 1)
        code = (code << 1) | ((h2 >> b) & 1)
    return code


@functools.partial(jax.jit, static_argnames=("bits",))
def hilbert_decode(code, bits: int = BITS):
    """Inverse of hilbert_encode -> (x, y, z)."""
    code = code.astype(jnp.int32)
    h0 = jnp.zeros_like(code)
    h1 = jnp.zeros_like(code)
    h2 = jnp.zeros_like(code)
    for b in range(bits):
        # level b (from LSB): bits at positions 3*b+2 (h0), 3*b+1 (h1), 3*b (h2)
        h0 = h0 | (((code >> (3 * b + 2)) & 1) << b)
        h1 = h1 | (((code >> (3 * b + 1)) & 1) << b)
        h2 = h2 | (((code >> (3 * b)) & 1) << b)
    return _transpose_to_axes(h0, h1, h2, bits)


def encode(coords: jnp.ndarray, mode: str = "z_order", permute=(0, 1, 2)) -> jnp.ndarray:
    """Encode [N,3] int coords to curve codes.

    `permute` reorders the axes before encoding — the reference rotates among
    4 SerializeModes (sparse/attention/serialized_attn.py:23-35); an axis
    permutation composed with z_order/hilbert covers all of them.
    """
    a = coords[..., permute[0]]
    b = coords[..., permute[1]]
    c = coords[..., permute[2]]
    if mode == "z_order":
        return z_order_encode(a, b, c)
    if mode == "hilbert":
        return hilbert_encode(a, b, c)
    raise ValueError(f"unknown curve mode: {mode}")


def decode(code: jnp.ndarray, mode: str = "z_order", permute=(0, 1, 2)) -> jnp.ndarray:
    """Decode curve codes back to [N,3] int coords (inverse of `encode`)."""
    if mode == "z_order":
        abc = z_order_decode(code)
    elif mode == "hilbert":
        abc = hilbert_decode(code)
    else:
        raise ValueError(f"unknown curve mode: {mode}")
    out = [None, None, None]
    for i, axis in enumerate(permute):
        out[axis] = abc[i]
    return jnp.stack(out, axis=-1)
