"""Sparse attention: full / windowed (swin) / serialized (space-filling curve).

TPU-native redesign of the reference's three sparse attention variants
(sparse/attention/full_attn.py:90, windowed_attn.py:63, serialized_attn.py:119),
which all lower to flash-attn varlen kernels over ragged CUDA layouts. Here:

  - full: per-sample dense attention with a validity mask ([B, L] padded
    layout makes "varlen packing" a plain mask) — XLA fuses to a flash-style
    kernel on TPU via jax.nn.dot_product_attention.
  - windowed (swin): voxels sorted by 3-D window id; windows are contiguous
    runs of length <= window_size^3. A run of length <= S always lies within
    two adjacent S-chunks, so BANDED chunked attention (each S-chunk of
    queries attends to [prev|self|next] chunks of keys, masked by window-id
    equality) is exact — static shapes, MXU-sized tiles, no ragged layouts.
  - serialized: voxels sorted by Z-order/Hilbert code (ops/curves.py), fixed
    token windows along the 1-D curve with optional sequence shift — already
    chunk-shaped by construction.

All modes share one inner primitive, `chunked_banded_attention`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import curves
from .tensor import SparseVoxels


def _masked_attention(q, k, v, mask):
    """dot_product_attention with NaN-safe handling of fully-masked rows:
    the diagonal-self fallback is the caller's duty; here we just ensure at
    least one key is visible by OR-ing in key 0 for dead rows (their output
    is garbage but masked out downstream)."""
    any_visible = jnp.any(mask, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(mask).at[..., 0].set(True)
    mask = jnp.where(any_visible, mask, fallback)
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


# Above this many score-matrix elements per (batch, head), the XLA masked
# path's materialized [Lq, Lk] logits dominate HBM traffic; switch to a
# fused kernel. Module-level so tests/benches can force either path.
# FUSED_SCORE_ELEMENTS gates the whole-Lk row-blocked kernel (covers the
# SLat torso: 4096x1370 cross was 135 ms/call of XLA-masked score traffic);
# FLASH_SCORE_ELEMENTS gates the streaming flash fallback when the fused
# kernel's Lk limit is exceeded.
FUSED_SCORE_ELEMENTS = 1024 * 1024
FLASH_SCORE_ELEMENTS = 4096 * 4096
_FORCE_FLASH: Optional[bool] = None  # True/False overrides the heuristic


def _flash_full_attention(q, k, v, q_valid, kv_valid):
    """Streaming flash attention (stock Pallas TPU kernel) for the `full`
    mode at large L — O(block) memory instead of a materialized [B,H,Lq,Lk]
    score tensor. Validity becomes segment ids: valid kv tokens are segment 1,
    padding/invalid kv segment 0; every query joins segment 1 (invalid query
    rows produce finite garbage that downstream masking discards, the same
    contract as `_masked_attention`'s fallback)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    b, lq, h, d = q.shape
    lk = k.shape[1]
    blk = 512
    pq, pk = (-lq) % blk, (-lk) % blk
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, pk)))
    seg = SegmentIds(
        q=jnp.ones((b, lq + pq), jnp.int32),
        kv=kv_valid.astype(jnp.int32),
    )
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), segment_ids=seg,
        sm_scale=1.0 / (d ** 0.5), block_sizes=bs,
    )
    return out.transpose(0, 2, 1, 3)[:, :lq]


def full_sparse_attention(q, k, v, q_valid, kv_valid):
    """q [B, Lq, H, D], k/v [B, Lk, H, D]; per-sample full attention over
    valid tokens (the reference's varlen-packed full attention,
    sparse/attention/full_attn.py:90).

    Dispatch: the fused whole-Lk kernel (ops/fused_attention.py, kv validity
    as a logit-bias row) when Lk fits its VMEM budget — measured fastest at
    the SLat torso shapes (Lq=4096, Lk<=4096, D=64); the streaming flash
    kernel beyond that; the masked XLA path off-TPU / at small L."""
    lq, lk = q.shape[1], k.shape[1]
    use_flash = _FORCE_FLASH
    if use_flash is None and jax.default_backend() == "tpu":
        from ..ops import fused_attention as fa

        if fa.supports(q.shape, k.shape) and lq * lk >= FUSED_SCORE_ELEMENTS:
            kv_bias = jnp.where(kv_valid, 0.0, -jnp.inf).astype(jnp.float32)
            return fa.fused_attention(
                q, k, v, q.shape[-1] ** -0.5, kv_bias=kv_bias
            )
        use_flash = lq * lk >= FLASH_SCORE_ELEMENTS and q.shape[-1] % 8 == 0
    if use_flash:
        return _flash_full_attention(q, k, v, q_valid, kv_valid)
    mask = q_valid[:, None, :, None] & kv_valid[:, None, None, :]  # [B,1,Lq,Lk]
    return _masked_attention(q, k, v, mask)


def chunked_banded_attention(q, k, v, q_seg, k_seg, chunk: int):
    """Queries in S-chunks attend to [prev|self|next] key chunks, masked by
    segment-id equality. Exact for contiguous segments of length <= chunk.

    q,k,v: [B, L, H, D]; q_seg/k_seg: [B, L] int32, -1 = invalid. L is padded
    internally to a multiple of chunk. With n<=2 chunks the band degenerates
    ([self] or [prev|self]) so no key is ever duplicated — duplicated keys
    would bias the softmax.
    """
    b, l, h, d = q.shape
    pad = (-l) % chunk
    if pad:
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        q, k, v = zpad(q), zpad(k), zpad(v)
        q_seg = jnp.pad(q_seg, ((0, 0), (0, pad)), constant_values=-1)
        k_seg = jnp.pad(k_seg, ((0, 0), (0, pad)), constant_values=-1)
    lp = l + pad
    n = lp // chunk
    qc = q.reshape(b, n, chunk, h, d)
    kc = k.reshape(b, n, chunk, h, d)
    vc = v.reshape(b, n, chunk, h, d)
    sq = q_seg.reshape(b, n, chunk)
    sk = k_seg.reshape(b, n, chunk)

    if n == 1:
        blocks = lambda a: a
        nb = 1
    elif n == 2:
        blocks = lambda a: jnp.concatenate([jnp.roll(a, 1, axis=1), a], axis=2)
        nb = 2
    else:
        blocks = lambda a: jnp.concatenate(
            [jnp.roll(a, 1, axis=1), a, jnp.roll(a, -1, axis=1)], axis=2
        )
        nb = 3
    kb, vb, skb = blocks(kc), blocks(vc), blocks(sk)

    mask = (sq[..., :, None] == skb[..., None, :]) & (sq[..., :, None] >= 0)
    mask = mask[:, :, None, :, :]  # [b, n, 1(H), chunk, nb*chunk]

    out = _masked_attention(
        qc.reshape(b * n, chunk, h, d),
        kb.reshape(b * n, nb * chunk, h, d),
        vb.reshape(b * n, nb * chunk, h, d),
        mask.reshape(b * n, 1, chunk, nb * chunk),
    )
    return out.reshape(b, lp, h, d)[:, :l]


def window_ids(
    coords: jnp.ndarray, valid: jnp.ndarray, resolution: int,
    window_size: int, shift: Tuple[int, int, int] = (0, 0, 0),
) -> jnp.ndarray:
    """3-D swin window id per voxel ([B, L], -1 invalid). Mirrors
    calc_window_partition (reference sparse/attention/windowed_attn.py:20-60):
    integer-divide shifted coords."""
    shifted = coords + jnp.asarray(shift, jnp.int32)
    w = shifted // window_size
    n_w = (resolution + window_size - 1) // window_size + 1
    wid = w[..., 0] * n_w * n_w + w[..., 1] * n_w + w[..., 2]
    return jnp.where(valid, wid, -1)


def sort_by_key(key: jnp.ndarray, invalid_last: bool = True):
    """argsort with invalid (-1) keys pushed to the end. key: [B, L]."""
    big = jnp.iinfo(jnp.int32).max
    k = jnp.where(key < 0, big, key) if invalid_last else key
    return jnp.argsort(k, axis=1)


def windowed_sparse_attention(
    q, k, v, x: SparseVoxels, window_size: int, shift=(0, 0, 0), chunk: Optional[int] = None,
):
    """Swin attention over 3-D windows. q/k/v: [B, L, H, D] aligned with x."""
    chunk = chunk or window_size**3
    wid = window_ids(x.coords, x.valid, x.resolution, window_size, shift)
    order = sort_by_key(wid)
    inv = jnp.argsort(order, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
    )
    seg = jnp.take_along_axis(wid, order, axis=1)
    out = chunked_banded_attention(take(q), take(k), take(v), seg, seg, chunk)
    return jnp.take_along_axis(out, inv[..., None, None], axis=1)


def serialized_sparse_attention(
    q, k, v, x: SparseVoxels, window_tokens: int,
    curve: str = "z_order", permute=(0, 1, 2), seq_shift: int = 0,
):
    """Space-filling-curve attention: sort by curve code, fixed token windows
    along the 1-D order (reference serialized_attn.py:38-116; the 4 rotating
    SerializeModes map to (curve, permute) pairs)."""
    code = curves.encode(x.coords, mode=curve, permute=permute)
    code = jnp.where(x.valid, code, -1)
    order = sort_by_key(code)
    if seq_shift:
        order = jnp.roll(order, seq_shift, axis=1)
    inv = jnp.argsort(order, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
    )
    valid_sorted = jnp.take_along_axis(x.valid, order, axis=1)
    b, l = valid_sorted.shape
    n = l // window_tokens
    # segment id = window index along the curve (invalid -> -1)
    seg = jnp.broadcast_to(
        jnp.repeat(jnp.arange(n, dtype=jnp.int32), window_tokens)[None], (b, l)
    )
    seg = jnp.where(valid_sorted, seg, -1)
    qs, ks, vs = take(q), take(k), take(v)
    # windows == chunks: banded form degenerates to exact window attention
    out = chunked_banded_attention(qs, ks, vs, seg, seg, window_tokens)
    return jnp.take_along_axis(out, inv[..., None, None], axis=1)


class SparseMultiHeadAttention(nn.Module):
    """Sparse MHA (reference sparse/attention/modules.py:90): qkv projection
    on voxel features, mode dispatch full/windowed/serialized, optional qk
    RMS-norm; cross mode attends sparse queries to a dense [B, Lkv, C] context.
    """

    channels: int
    num_heads: int
    attn_mode: str = "full"  # full | windowed | serialized
    window_size: Optional[int] = None
    shift_window: Tuple[int, int, int] = (0, 0, 0)
    serialize_curve: str = "z_order"
    serialize_permute: Tuple[int, int, int] = (0, 1, 2)
    seq_shift: int = 0
    ctx_channels: Optional[int] = None
    attn_type: str = "self"  # self | cross
    qkv_bias: bool = True
    qk_rms_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: SparseVoxels, context: Optional[jnp.ndarray] = None):
        from ..nn.attention import MultiHeadRMSNorm

        h_dim = self.channels // self.num_heads
        b, l, _ = x.feats.shape

        if self.attn_type == "self":
            qkv = nn.Dense(
                3 * self.channels, use_bias=self.qkv_bias, dtype=self.dtype,
                name="to_qkv",
            )(x.feats).reshape(b, l, 3, self.num_heads, h_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            assert context is not None
            q = nn.Dense(
                self.channels, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q"
            )(x.feats).reshape(b, l, self.num_heads, h_dim)
            kv = nn.Dense(
                2 * self.channels, use_bias=self.qkv_bias, dtype=self.dtype,
                name="to_kv",
            )(context).reshape(b, context.shape[1], 2, self.num_heads, h_dim)
            k, v = kv[:, :, 0], kv[:, :, 1]

        if self.qk_rms_norm:
            q = MultiHeadRMSNorm(h_dim, self.num_heads, name="q_rms_norm")(q)
            k = MultiHeadRMSNorm(h_dim, self.num_heads, name="k_rms_norm")(k)

        if self.attn_type == "cross":
            kv_valid = jnp.ones(context.shape[:2], bool)
            out = full_sparse_attention(q, k, v, x.valid, kv_valid)
        elif self.attn_mode == "full":
            out = full_sparse_attention(q, k, v, x.valid, x.valid)
        elif self.attn_mode == "windowed":
            out = windowed_sparse_attention(
                q, k, v, x, self.window_size, self.shift_window
            )
        elif self.attn_mode == "serialized":
            out = serialized_sparse_attention(
                q, k, v, x, self.window_size,
                curve=self.serialize_curve, permute=self.serialize_permute,
                seq_shift=self.seq_shift,
            )
        else:
            raise ValueError(self.attn_mode)

        out = out.reshape(b, l, self.channels)
        out = nn.Dense(self.channels, dtype=self.dtype, name="to_out")(out)
        return x.replace_feats(out)
