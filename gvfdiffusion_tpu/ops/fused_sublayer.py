"""Fused transformer-sublayer Pallas kernels for the DiT hot loop.

Round-5 platform measurements (benchmarks/{xla_stream,dma,buffered}_probe.py,
one v5e chip via axon) reframed the denoise bottleneck: HBM streaming rate
depends on the EMITTER — XLA matmul tiles sustain ~190-270 GB/s, but XLA
elementwise fusions only ~46-60 GB/s and Pallas cells ~60-110 GB/s, while the
MXU's marginal rate on VMEM-resident data is ~184 TF/s. Every DiT sublayer at
inference batch is therefore bandwidth-bound, and the win is not faster math
but FEWER HBM ROUND-TRIPS.

These kernels fuse an entire pre-norm transformer sublayer — LayerNorm (fp32
stats) + adaLN modulate + QKV projection + optional per-head QK RMS-norm +
softmax attention + output projection + gated residual — into ONE Pallas
kernel whose grid cells each process one frame/row-block while all weights
stay VMEM-resident (constant index maps: Mosaic skips re-DMA of unchanged
blocks). Per sublayer the residual stream is read and written exactly once:
~34 MB instead of the ~200-500 MB the unfused chain streams at dual-CFG
shapes (reference hot loop: model/dit.py:141-283, the
ModulatedSparseTransformerCrossBlock the reference runs 12x per solver step).

Attention inside uses the dense-packed narrow-head scheme (see
ops/fused_attention.py): per 128-lane group, head h's scores are
dot(where(lane//D == h, q, 0), k) over the FULL 128-deep contraction —
bit-identical math to the per-head slice, but full-width MXU ops with no
sub-lane relayouts. QK RMS-norm sums-of-squares ride the MXU too, via a
block-diagonal 0/1 lane matrix.

Backward: custom_vjp recomputes the sublayer with the pure-XLA reference
implementation (`*_reference`) and differentiates that — the kernels are the
inference win; training keeps XLA numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_LOG2E = 1.4426950408889634
_SHIFT = 30.0  # exp2 shift; cancels in softmax normalization
_LN_EPS = 1e-6
_RMS_EPS = 1e-12


def _layernorm_f32(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS)


def _head_blockdiag(C, D, dtype):
    """[C, C] 0/1 matrix, ones where i//D == j//D: one MXU op against it
    sums squares within each head's lane block and broadcasts the sum to
    all D lanes of that head."""
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // D
    c = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // D
    return (r == c).astype(dtype)


def _rms_norm_lanes(q, bd_mask, gamma_lanes):
    """Per-head RMS norm with lane-packed heads: q [L, C] f32,
    gamma_lanes [C] = gamma.flatten() * sqrt(D). Matches
    nn/attention.py MultiHeadRMSNorm (sum of squares + 1e-12)."""
    ss = jax.lax.dot_general(
        jnp.square(q), bd_mask, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return q * jax.lax.rsqrt(ss + _RMS_EPS) * gamma_lanes[None, :]


def _packed_attention(q, k, v, *, head_dim, compute_dtype, scale,
                      seg_mask=None, kv_bias=None):
    """Dense-packed attention on VMEM-resident q [Lq, C], k/v [Lk, C] (f32 or
    bf16 in, f32 out). Returns [Lq, C] f32 (already softmax-normalized)."""
    Lq, C = q.shape
    out = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1) // head_dim
    hpg = _LANES // head_dim
    for g in range(C // _LANES):
        gsl = slice(g * _LANES, (g + 1) * _LANES)
        qg = q[:, gsl].astype(compute_dtype)
        kg = k[:, gsl].astype(compute_dtype)
        vg = v[:, gsl].astype(compute_dtype)
        o_acc = jnp.zeros((Lq, _LANES), jnp.float32)
        d_acc = jnp.zeros((Lq, _LANES), jnp.float32)
        for h in range(hpg):
            sel = lane == h
            qm = jnp.where(sel, qg, jnp.zeros((), compute_dtype))
            s = jax.lax.dot_general(
                qm, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * (scale * _LOG2E) - _SHIFT
            if kv_bias is not None:
                s = s + kv_bias
            if seg_mask is not None:
                s = jnp.where(seg_mask, s, -jnp.inf)
            p32 = jnp.exp2(s)
            denom = jnp.sum(p32, axis=-1, keepdims=True)
            o_h = jax.lax.dot_general(
                p32.astype(compute_dtype), vg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_acc = o_acc + jnp.where(sel, o_h, 0.0)
            d_acc = d_acc + jnp.where(sel, denom, 0.0)
        out.append(o_acc / jnp.maximum(d_acc, 1e-30))
    return jnp.concatenate(out, axis=1) if len(out) > 1 else out[0]


# -- fused modulated self-attention sublayer ----------------------------------
#
#   y = x + gate * Wo @ attn(rms(q), rms(k), v) where qkv = Wqkv @ modulate(
#       LN(x), shift, scale)
#
# grid cell = one batch row block [1, L, C] (one frame for the DiT spatial
# branch). Weights/bias/gamma blocks use constant index maps -> DMA'd once.


def _self_sublayer_kernel(x_ref, sh_ref, sc_ref, g_ref, wqkv_ref, bqkv_ref,
                          qg_ref, kg_ref, wo_ref, bo_ref, o_ref, *,
                          num_heads: int, rms: bool, compute_dtype,
                          seg: int):
    L, C = x_ref.shape[1], x_ref.shape[2]
    D = C // num_heads
    xb = x_ref[0]
    xf = xb.astype(jnp.float32)
    h = _layernorm_f32(xf)
    h = h * (1.0 + sc_ref[0, 0].astype(jnp.float32)[None, :]) \
        + sh_ref[0, 0].astype(jnp.float32)[None, :]
    hb = h.astype(compute_dtype)

    def proj(w_sl, b_sl):
        r = jax.lax.dot_general(
            hb, wqkv_ref[:, w_sl].astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        return r + bqkv_ref[0, b_sl].astype(jnp.float32)[None, :]

    q = proj(slice(0, C), slice(0, C))
    k = proj(slice(C, 2 * C), slice(C, 2 * C))
    v = proj(slice(2 * C, 3 * C), slice(2 * C, 3 * C))
    if rms:
        bd = _head_blockdiag(C, D, jnp.float32)
        q = _rms_norm_lanes(q, bd, qg_ref[0].astype(jnp.float32))
        k = _rms_norm_lanes(k, bd, kg_ref[0].astype(jnp.float32))

    seg_mask = None
    if seg > 1:
        # rows are (t, n) flattened with NC=seg voxels packed per row block:
        # attention couples only rows with equal n (the temporal branch)
        r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) % seg
        c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) % seg
        seg_mask = r == c

    attn = _packed_attention(
        q, k, v, head_dim=D, compute_dtype=compute_dtype,
        scale=D ** -0.5, seg_mask=seg_mask,
    )
    out = jax.lax.dot_general(
        attn.astype(compute_dtype), wo_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)[None, :]
    y = xf + out * g_ref[0, 0].astype(jnp.float32)[None, :]
    o_ref[0] = y.astype(o_ref.dtype)


def _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                            num_heads: int, rms: bool, compute_dtype,
                            seg: int, interpret: bool):
    """x [B, L, C]; sh/sc/gate [B, C]; wqkv [C, 3C]; bqkv [3C]; qg/kg [C]
    (gamma.flatten() * sqrt(D)); wo [C, C]; bo [C] -> y [B, L, C]."""
    B, L, C = x.shape
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(
        _self_sublayer_kernel, num_heads=num_heads, rms=rms,
        compute_dtype=compute_dtype, seg=seg,
    )
    vec = lambda: pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
            const((C, 3 * C)), const((1, 3 * C)),
            const((1, C)), const((1, C)),
            const((C, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * C * (4 * C + 2 * L),
            bytes_accessed=2 * B * L * C * x.dtype.itemsize,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(x, sh[:, None, :], sc[:, None, :], gate[:, None, :], wqkv,
      row(bqkv), row(qg), row(kg), wo, row(bo))


def self_sublayer_reference(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                            num_heads: int, rms: bool,
                            compute_dtype=jnp.bfloat16, seg: int = 0):
    """Pure-XLA reference of the fused sublayer (same math, used as the
    custom_vjp backward and in goldens)."""
    B, L, C = x.shape
    D = C // num_heads
    xf = x.astype(jnp.float32)
    h = _layernorm_f32(xf)
    h = h * (1.0 + sc.astype(jnp.float32)[:, None, :]) \
        + sh.astype(jnp.float32)[:, None, :]
    qkv = jnp.einsum("blc,cd->bld", h.astype(compute_dtype),
                     wqkv.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    qkv = qkv + bqkv.astype(jnp.float32)[None, None, :]
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    if rms:
        def _rms(a, g):
            ah = a.reshape(B, L, num_heads, D)
            ss = jnp.sum(jnp.square(ah), axis=-1, keepdims=True)
            return (ah * jax.lax.rsqrt(ss + _RMS_EPS)).reshape(B, L, C) \
                * g[None, None, :]
        q = _rms(q, qg.astype(jnp.float32))
        k = _rms(k, kg.astype(jnp.float32))
    qh = q.reshape(B, L, num_heads, D)
    kh = k.reshape(B, L, num_heads, D)
    vh = v.reshape(B, L, num_heads, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(compute_dtype),
                   kh.astype(compute_dtype),
                   preferred_element_type=jnp.float32) * D ** -0.5
    if seg > 1:
        r = jnp.arange(L)[:, None] % seg
        c = jnp.arange(L)[None, :] % seg
        s = jnp.where((r == c)[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bhqk,bkhd->bqhd", p.astype(compute_dtype),
                      vh.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(B, L, C)
    out = jnp.einsum("blc,cd->bld", attn.astype(compute_dtype),
                     wo.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)[None, None, :]
    y = xf + out * gate.astype(jnp.float32)[:, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                   num_heads, rms, compute_dtype, seg, interpret):
    return _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo,
                                   bo, num_heads, rms, compute_dtype, seg,
                                   interpret)


def _self_fwd(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, num_heads, rms,
              compute_dtype, seg, interpret):
    y = _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                                num_heads, rms, compute_dtype, seg, interpret)
    return y, (x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo)


def _self_bwd(num_heads, rms, compute_dtype, seg, interpret, res, gy):
    f = functools.partial(self_sublayer_reference, num_heads=num_heads,
                          rms=rms, compute_dtype=compute_dtype, seg=seg)
    _, vjp = jax.vjp(f, *res)
    return vjp(gy)


_self_sublayer.defvjp(_self_fwd, _self_bwd)


def fused_self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, *,
                        num_heads: int, rms: bool = True,
                        compute_dtype=jnp.bfloat16, seg: int = 0,
                        interpret: bool = False):
    """Fused pre-norm modulated self-attention sublayer (one HBM round-trip).

    seg > 1: rows are sequence-packed groups of `seg` independent streams
    interleaved (row i attends only rows j with i%seg == j%seg) — the DiT
    temporal branch packs NC voxels per cell this way."""
    return _self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                          num_heads, rms, compute_dtype, seg, interpret)


def self_sublayer_supports(B, L, C, num_heads) -> bool:
    D = C // num_heads
    vmem_est = (
        2 * 2 * L * C * 2            # x/y blocks double-buffered, bf16
        + C * 3 * C * 2 + C * C * 2  # resident weights
        + 3 * L * C * 4              # q/k/v f32
        + L * C * 4                  # LN f32
        + L * L * 4 + L * _LANES * 8  # score tile + accumulators
    )
    return (
        C % _LANES == 0
        and _LANES % D == 0
        and L % _LANES == 0
        and L * L * 4 <= 8 * 1024 * 1024
        and vmem_est <= 14 * 1024 * 1024
    )
