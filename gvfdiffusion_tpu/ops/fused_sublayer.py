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
                      seg_mask=None, kv_bias=None, k_int8=None, ks_t=None,
                      quant_qk=False):
    """Dense-packed attention on VMEM-resident q [Lq, C], k/v [Lk, C] (f32 or
    bf16 in, f32 out). Returns [Lq, C] f32 (already softmax-normalized).

    k_int8/ks_t: int8 QK mode — k is the int8 cache [Lk, C] with transposed
    per-(head, token) scales ks_t [H, Lk]; q is quantized in-kernel with a
    per-(cell, head) max-abs scale (the head's lanes are already isolated in
    the masked qm, so its max IS the per-head max). The QK contraction runs
    int8 x int8 -> int32 at 2x the bf16 MXU rate — the packed narrow-head
    attention is MXU-bound (4x lane-packing waste), so this halves its
    dominant cost. The product scale rides the existing softmax epilogue as
    a per-column factor; AV stays bf16 (P is exp2-shifted, unquantizable).

    quant_qk: int8 QK mode for the SELF kernels — k arrives float (computed
    in-kernel from the residual stream) and is quantized here with one
    max-abs scale per (cell, head): both operands of the dominant QK dot go
    int8 with purely scalar score factors. Same 2x MXU rate as the cached
    int8 path, no per-token scale stream needed."""
    Lq, C = q.shape
    out = []
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1) // head_dim
    hpg = _LANES // head_dim
    for g in range(C // _LANES):
        gsl = slice(g * _LANES, (g + 1) * _LANES)
        qg = q[:, gsl]
        kg = None if k_int8 is not None else k[:, gsl].astype(compute_dtype)
        vg = v[:, gsl].astype(compute_dtype)
        ki = k_scales = None
        if quant_qk:
            kf = k[:, gsl].astype(jnp.float32)
            k_scales = []
            lane_scale = jnp.zeros((1, _LANES), jnp.float32)
            for h in range(hpg):
                sel = lane == h
                ksh = jnp.maximum(
                    jnp.max(jnp.abs(jnp.where(sel, kf, 0.0))), 1e-8)
                k_scales.append(ksh)
                lane_scale = lane_scale + jnp.where(sel, ksh, 0.0)
            ki = jnp.round(kf * (127.0 / lane_scale)).astype(jnp.int8)
        o_acc = jnp.zeros((Lq, _LANES), jnp.float32)
        d_acc = jnp.zeros((Lq, _LANES), jnp.float32)
        for h in range(hpg):
            sel = lane == h
            if k_int8 is not None or quant_qk:
                qm = jnp.where(sel, qg.astype(jnp.float32), 0.0)
                qs = jnp.maximum(jnp.max(jnp.abs(qm)), 1e-8)
                qi = jnp.round(qm * (127.0 / qs)).astype(jnp.int8)
                si = jax.lax.dot_general(
                    qi, ki if quant_qk else k_int8[:, gsl],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if quant_qk:
                    s = si.astype(jnp.float32) * (
                        qs * k_scales[h] * scale * _LOG2E / (127.0 * 127.0)
                    ) - _SHIFT
                else:
                    col = ks_t[g * hpg + h, :][None, :].astype(jnp.float32)
                    s = si.astype(jnp.float32) * (
                        col * (qs * scale * _LOG2E / 127.0)) - _SHIFT
            else:
                qm = jnp.where(sel, qg.astype(compute_dtype),
                               jnp.zeros((), compute_dtype))
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
                          seg: int, quant_qk: bool = False):
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
        scale=D ** -0.5, seg_mask=seg_mask, quant_qk=quant_qk,
    )
    out = jax.lax.dot_general(
        attn.astype(compute_dtype), wo_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)[None, :]
    y = xf + out * g_ref[0, 0].astype(jnp.float32)[None, :]
    o_ref[0] = y.astype(o_ref.dtype)


def _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                            num_heads: int, rms: bool, compute_dtype,
                            seg: int, mod_repeat: int, interpret: bool,
                            quant_qk: bool = False):
    """x [B, L, C]; sh/sc/gate [B // mod_repeat, C] (cell i uses modulation
    row i // mod_repeat — frames of one sample share a timestep embedding);
    wqkv [C, 3C]; bqkv [3C]; qg/kg [C] (gamma.flatten() * sqrt(D));
    wo [C, C]; bo [C] -> y [B, L, C]."""
    B, L, C = x.shape
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(
        _self_sublayer_kernel, num_heads=num_heads, rms=rms,
        compute_dtype=compute_dtype, seg=seg, quant_qk=quant_qk,
    )
    mr = mod_repeat
    vec = lambda: pl.BlockSpec((1, 1, C), lambda i: (i // mr, 0, 0),
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


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def _self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                   num_heads, rms, compute_dtype, seg, mod_repeat,
                   interpret, quant_qk):
    return _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo,
                                   bo, num_heads, rms, compute_dtype, seg,
                                   mod_repeat, interpret, quant_qk)


def _self_fwd(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, num_heads, rms,
              compute_dtype, seg, mod_repeat, interpret, quant_qk):
    y = _self_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                                num_heads, rms, compute_dtype, seg,
                                mod_repeat, interpret, quant_qk)
    return y, (x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo)


def _self_bwd(num_heads, rms, compute_dtype, seg, mod_repeat, interpret,
              quant_qk, res, gy):
    x, sh, sc, gate = res[0], res[1], res[2], res[3]
    rep = lambda a: jnp.repeat(a, mod_repeat, axis=0) if mod_repeat > 1 else a
    f = functools.partial(self_sublayer_reference, num_heads=num_heads,
                          rms=rms, compute_dtype=compute_dtype, seg=seg)
    _, vjp = jax.vjp(f, x, rep(sh), rep(sc), rep(gate), *res[4:])
    grads = list(vjp(gy))
    if mod_repeat > 1:
        for i in (1, 2, 3):
            g = grads[i]
            grads[i] = g.reshape(-1, mod_repeat, g.shape[-1]).sum(axis=1)
    return tuple(grads)


_self_sublayer.defvjp(_self_fwd, _self_bwd)


def fused_self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, *,
                        num_heads: int, rms: bool = True,
                        compute_dtype=jnp.bfloat16, seg: int = 0,
                        mod_repeat: int = 1, interpret: bool = False,
                        quant_qk: bool = False):
    """Fused pre-norm modulated self-attention sublayer (one HBM round-trip).

    seg > 1: rows are sequence-packed groups of `seg` independent streams
    interleaved (row i attends only rows j with i%seg == j%seg) — the DiT
    temporal branch packs NC voxels per cell this way.

    mod_repeat > 1: sh/sc/gate have B // mod_repeat rows; cell i reads row
    i // mod_repeat (frames of one video share the timestep modulation)."""
    return _self_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                          num_heads, rms, compute_dtype, seg, mod_repeat,
                          interpret, quant_qk)


# -- fused temporal sublayer ---------------------------------------------------
#
# Same math as the self sublayer but on the NATIVE [B, T, N, C] layout: a grid
# cell is (b, chunk of NC voxels) holding all T frames, rows flatten to
# (t, n) and attention couples rows with equal n (seg=NC) — the transpose-free
# temporal branch (reference model/dit.py:244-260), now with its LN/mod/qkv/
# out-proj round-trips fused away too.

_TEMPORAL_NC = 16


def _temporal_sublayer_kernel(x_ref, sh_ref, sc_ref, g_ref, wqkv_ref,
                              bqkv_ref, qg_ref, kg_ref, wo_ref, bo_ref,
                              o_ref, *, num_heads: int, rms: bool,
                              compute_dtype, quant_qk: bool = False):
    _, T, NC, C = x_ref.shape
    D = C // num_heads
    xb = x_ref[0].reshape(T * NC, C)
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
    L = T * NC
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) % NC
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) % NC
    attn = _packed_attention(
        q, k, v, head_dim=D, compute_dtype=compute_dtype,
        scale=D ** -0.5, seg_mask=(r == c), quant_qk=quant_qk,
    )
    out = jax.lax.dot_general(
        attn.astype(compute_dtype), wo_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bo_ref[0].astype(jnp.float32)[None, :]
    y = xf + out * g_ref[0, 0].astype(jnp.float32)[None, :]
    o_ref[0] = y.reshape(T, NC, C).astype(o_ref.dtype)


def _temporal_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                                num_heads: int, rms: bool, compute_dtype,
                                interpret: bool, quant_qk: bool = False):
    """x [B, T, N, C]; sh/sc/gate [B, C] -> y [B, T, N, C]; temporal
    attention over T per (b, n)."""
    B, T, N, C = x.shape
    nc = _TEMPORAL_NC
    while N % nc:
        nc //= 2
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(
        _temporal_sublayer_kernel, num_heads=num_heads, rms=rms,
        compute_dtype=compute_dtype, quant_qk=quant_qk,
    )
    vec = lambda: pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda b, j: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, N // nc),
        in_specs=[
            pl.BlockSpec((1, T, nc, C), lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM),
            vec(), vec(), vec(),
            const((C, 3 * C)), const((1, 3 * C)),
            const((1, C)), const((1, C)),
            const((C, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((1, T, nc, C), lambda b, j: (b, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, N, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * N * C * (4 * C + 2 * T),
            bytes_accessed=2 * B * T * N * C * x.dtype.itemsize,
            transcendentals=B * num_heads * N * T * T,
        ),
        interpret=interpret,
    )(x, sh[:, None, :], sc[:, None, :], gate[:, None, :], wqkv,
      row(bqkv), row(qg), row(kg), wo, row(bo))


def temporal_sublayer_reference(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                                num_heads: int, rms: bool,
                                compute_dtype=jnp.bfloat16):
    """Pure-XLA reference: [B, T, N, C], attention over T per (b, n, h)."""
    B, T, N, C = x.shape
    D = C // num_heads
    xf = x.astype(jnp.float32)
    h = _layernorm_f32(xf)
    h = h * (1.0 + sc.astype(jnp.float32)[:, None, None, :]) \
        + sh.astype(jnp.float32)[:, None, None, :]
    qkv = jnp.einsum("btnc,cd->btnd", h.astype(compute_dtype),
                     wqkv.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    qkv = qkv + bqkv.astype(jnp.float32)
    q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
    if rms:
        def _rms(a, g):
            ah = a.reshape(B, T, N, num_heads, D)
            ss = jnp.sum(jnp.square(ah), axis=-1, keepdims=True)
            return (ah * jax.lax.rsqrt(ss + _RMS_EPS)).reshape(B, T, N, C) \
                * g[None, None, None, :]
        q = _rms(q, qg.astype(jnp.float32))
        k = _rms(k, kg.astype(jnp.float32))
    qh = q.reshape(B, T, N, num_heads, D)
    kh = k.reshape(B, T, N, num_heads, D)
    vh = v.reshape(B, T, N, num_heads, D)
    s = jnp.einsum("btnhd,bsnhd->bnhts", qh.astype(compute_dtype),
                   kh.astype(compute_dtype),
                   preferred_element_type=jnp.float32) * D ** -0.5
    p = jax.nn.softmax(s, axis=-1)
    attn = jnp.einsum("bnhts,bsnhd->btnhd", p.astype(compute_dtype),
                      vh.astype(compute_dtype),
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(B, T, N, C)
    out = jnp.einsum("btnc,cd->btnd", attn.astype(compute_dtype),
                     wo.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = out + bo.astype(jnp.float32)
    y = xf + out * gate.astype(jnp.float32)[:, None, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _temporal_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                       num_heads, rms, compute_dtype, interpret, quant_qk):
    return _temporal_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg,
                                       wo, bo, num_heads, rms, compute_dtype,
                                       interpret, quant_qk)


def _temporal_fwd(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, num_heads,
                  rms, compute_dtype, interpret, quant_qk):
    y = _temporal_sublayer_fwd_impl(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo,
                                    bo, num_heads, rms, compute_dtype,
                                    interpret, quant_qk)
    return y, (x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo)


def _temporal_bwd(num_heads, rms, compute_dtype, interpret, quant_qk,
                  res, gy):
    f = functools.partial(temporal_sublayer_reference, num_heads=num_heads,
                          rms=rms, compute_dtype=compute_dtype)
    _, vjp = jax.vjp(f, *res)
    return vjp(gy)


_temporal_sublayer.defvjp(_temporal_fwd, _temporal_bwd)


def fused_temporal_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo, *,
                            num_heads: int, rms: bool = True,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False, quant_qk: bool = False):
    """Fused temporal sublayer on native [B, T, N, C] (attention over T)."""
    return _temporal_sublayer(x, sh, sc, gate, wqkv, bqkv, qg, kg, wo, bo,
                              num_heads, rms, compute_dtype, interpret,
                              quant_qk)


def temporal_sublayer_supports(B, T, N, C, num_heads) -> bool:
    D = C // num_heads
    nc = _TEMPORAL_NC
    while nc and N % nc:
        nc //= 2
    L = T * (nc or 0)
    return (
        nc >= 1
        and C % _LANES == 0
        and _LANES % D == 0
        and L % 8 == 0
        and 128 <= L <= 1024
    )


# -- fused dual-cross-attention sublayer ---------------------------------------
#
#   x += Wo1 @ attn(q=Wq1 @ LN_affine(x), k1, v1)     (image cross)
#   x += Wo2 @ attn(q=Wq2 @ LN_affine(x), k2, v2)     (static cross)
#
# KV comes precomputed (the sampler's loop-invariant cache), lane-packed
# [B, Lk_pad, C] with the true kv length a compile-time constant — the
# padding mask is built in-kernel from iota, costing no extra stream.
#
# quant=True: the cache is stored int8 with per-(token, head) symmetric
# scales. The denoise is HBM-bound and the KV re-read is its largest stream
# (~90 MB/block at reference shapes), so halving those bytes is the lever —
# dequant happens in VMEM via one tiny [Lk, H] x [H, C] 0/1-expansion matmul
# (lane broadcast on the MXU, no relayout) and the QK/AV math stays bf16.


def quantize_kv(k: jnp.ndarray, num_heads: int):
    """[B, Lk, C] -> (int8 values [B, Lk, C], bf16 scales [B, Lk, H]);
    symmetric per-(token, head) max-abs scaling."""
    B, Lk, C = k.shape
    kh = k.astype(jnp.float32).reshape(B, Lk, num_heads, C // num_heads)
    scale = jnp.max(jnp.abs(kh), axis=-1) / 127.0  # [B, Lk, H]
    # round the scale to its bf16 storage FIRST so quantization divides by
    # exactly the value dequantization will multiply by
    scale = jnp.maximum(scale, 1e-8).astype(jnp.bfloat16)
    s32 = scale.astype(jnp.float32)[..., None]
    q = jnp.clip(jnp.round(kh / s32), -127, 127).astype(jnp.int8)
    return q.reshape(B, Lk, C), scale


def _head_expand(H, C, dtype):
    """[H, C] 0/1 matrix, ones where j // (C//H) == i: one MXU op against it
    broadcasts a per-head scalar row to that head's lane block."""
    r = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // (C // H)
    return (r == c).astype(dtype)


def _cross_sublayer_kernel(x_ref, *refs, num_heads: int, rms: bool,
                           compute_dtype, kv_lens, quant: bool):
    C = x_ref.shape[2]
    D = C // num_heads
    xf = x_ref[0].astype(jnp.float32)
    bd = _head_blockdiag(C, D, jnp.float32) if rms else None
    exp_mat = _head_expand(num_heads, C, compute_dtype) if quant else None
    per = 11 if quant else 9
    o_ref = refs[-1]

    def dequant(kq_ref, ks_ref):
        # per-(token, head) scales -> lane-expanded via one tiny MXU op
        sexp = jax.lax.dot_general(
            ks_ref[0].astype(compute_dtype), exp_mat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Lkp, C]
        return kq_ref[0].astype(compute_dtype) * sexp.astype(compute_dtype)

    def one_cross(xf, grp, kv_len):
        k_int8 = ks_t = None
        if quant:
            (ns_ref, nb_ref, wq_ref, bq_ref, qg_ref, wo_ref, bo_ref,
             k_ref, v_ref, kst_ref, vs_ref) = grp
            k_int8 = k_ref[0]          # int8 QK path: no dequant of K
            ks_t = kst_ref[0]          # [H, Lkp]
            k = None
            v = dequant(v_ref, vs_ref)
        else:
            (ns_ref, nb_ref, wq_ref, bq_ref, qg_ref, wo_ref, bo_ref,
             k_ref, v_ref) = grp
            k, v = k_ref[0], v_ref[0]
        h = _layernorm_f32(xf)
        h = h * ns_ref[0].astype(jnp.float32)[None, :] \
            + nb_ref[0].astype(jnp.float32)[None, :]
        q = jax.lax.dot_general(
            h.astype(compute_dtype), wq_ref[...].astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bq_ref[0].astype(jnp.float32)[None, :]
        if rms:
            q = _rms_norm_lanes(q, bd, qg_ref[0].astype(jnp.float32))
        lkp = k_ref.shape[1]
        kv_bias = None
        if kv_len < lkp:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, lkp), 1)
            kv_bias = jnp.where(col < kv_len, 0.0, -jnp.inf)
        attn = _packed_attention(
            q, k if k is not None else q, v, head_dim=D,
            compute_dtype=compute_dtype, scale=D ** -0.5, kv_bias=kv_bias,
            k_int8=k_int8, ks_t=ks_t,
        )
        out = jax.lax.dot_general(
            attn.astype(compute_dtype), wo_ref[...].astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bo_ref[0].astype(jnp.float32)[None, :]
        return xf + out

    n_ctx = (len(refs) - 1) // per
    for i in range(n_ctx):
        xf = one_cross(xf, refs[i * per:(i + 1) * per], kv_lens[i])
    o_ref[0] = xf.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_kv(k, m=128):
    lk = k.shape[1]
    lkp = _round_up(lk, m)
    if lkp != lk:
        k = jnp.pad(k, [(0, 0), (0, lkp - lk), (0, 0)])
    return k


def _cross_sublayer_fwd_impl(x, p1, kv1, p2, kv2, num_heads: int, rms: bool,
                             compute_dtype, quant: bool, interpret: bool,
                             lq_block: int = 0, kv_buffers: int = 2):
    """x [B, L, C]; p_i = (norm_scale [C], norm_bias [C], wq [C, C], bq [C],
    qg [C], wo [C, C], bo [C]); kv_i = (k, v) each [B, Lk_i, C] — or, with
    quant=True, (k int8, v int8, k_scale [B, Lk, H], v_scale [B, Lk, H]).
    p2/kv2 may be None (single-context form, e.g. the SLat torso).

    lq_block > 0 grids the query rows (KV blocks stay resident across row
    blocks of one batch element); kv_buffers=1 single-buffers the KV streams
    (trades pipeline overlap at batch transitions for half the KV VMEM —
    the L-gridded big-channel shapes need it to fit)."""
    B, L, C = x.shape
    groups = [(p1, kv1)] + ([(p2, kv2)] if p2 is not None else [])
    kv_lens = tuple(kv[0].shape[1] for _, kv in groups)

    def _pad_group(kv):
        if len(kv) == 4:  # (k int8, v int8, ks_t [B,H,Lk], vs [B,Lk,H])
            kq, vq, ks_t, vs = kv
            lkp = _round_up(kq.shape[1], 128)
            if lkp != kq.shape[1]:
                ks_t = jnp.pad(ks_t, [(0, 0), (0, 0),
                                      (0, lkp - ks_t.shape[2])])
            return (_pad_kv(kq), _pad_kv(vq), ks_t, _pad_kv(vs))
        return tuple(_pad_kv(a) for a in kv)

    groups = [(p, _pad_group(kv)) for p, kv in groups]
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(
        _cross_sublayer_kernel, num_heads=num_heads, rms=rms,
        compute_dtype=compute_dtype, kv_lens=kv_lens, quant=quant,
    )
    lq = lq_block if lq_block else L
    assert L % lq == 0
    grid = (B, L // lq)
    const = lambda shape: pl.BlockSpec(shape, lambda i, r: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    kv_mode = (pl.Buffered(buffer_count=1)
               if (kv_buffers == 1 and not interpret) else None)

    def kvspecs(kv):
        return [pl.BlockSpec((1,) + a.shape[1:], lambda i, r: (i, 0, 0),
                             memory_space=pltpu.VMEM, pipeline_mode=kv_mode)
                for a in kv]

    def pgroup(p):
        ns, nb, wq, bq, qg, wo, bo = p
        return [row(ns), row(nb), wq, row(bq), row(qg), wo, row(bo)]

    def pspecs():
        return [const((1, C)), const((1, C)), const((C, C)), const((1, C)),
                const((1, C)), const((C, C)), const((1, C))]

    in_specs = [pl.BlockSpec((1, lq, C), lambda i, r: (i, r, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for p, kv in groups:
        in_specs += pspecs() + kvspecs(kv)
        args += pgroup(p) + list(kv)
    lk_tot = sum(kv_lens)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, lq, C), lambda i, r: (i, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * C * (4 * C + 2 * lk_tot),
            bytes_accessed=(2 * B * L * C + 2 * B * C * lk_tot)
            * x.dtype.itemsize,
            transcendentals=B * num_heads * L * lk_tot,
        ),
        interpret=interpret,
    )(*args)


def dequantize_kv(kq: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Inverse of quantize_kv: int8 [B, Lk, C] x scales [B, Lk, H] -> float."""
    B, Lk, C = kq.shape
    H = scale.shape[-1]
    kh = kq.astype(jnp.float32).reshape(B, Lk, H, C // H)
    return (kh * scale.astype(jnp.float32)[..., None]).reshape(B, Lk, C)


def cross_sublayer_reference(x, p1, kv1, p2, kv2, num_heads: int, rms: bool,
                             compute_dtype=jnp.bfloat16, quant: bool = False):
    if quant:
        # quant tuples: (k int8, v int8, ks_t [B, H, Lk], vs [B, Lk, H])
        dq = lambda kv: (
            dequantize_kv(kv[0], kv[2].swapaxes(1, 2)).astype(compute_dtype),
            dequantize_kv(kv[1], kv[3]).astype(compute_dtype))
        kv1 = dq(kv1)
        kv2 = dq(kv2) if kv2 is not None else None
    B, L, C = x.shape
    D = C // num_heads
    xf = x.astype(jnp.float32)

    def one(xf, p, kv):
        ns, nb, wq, bq, qg, wo, bo = p
        k, v = kv
        h = _layernorm_f32(xf)
        h = h * ns.astype(jnp.float32) + nb.astype(jnp.float32)
        q = jnp.einsum("blc,cd->bld", h.astype(compute_dtype),
                       wq.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        q = q + bq.astype(jnp.float32)
        if rms:
            qh = q.reshape(B, L, num_heads, D)
            ss = jnp.sum(jnp.square(qh), axis=-1, keepdims=True)
            q = (qh * jax.lax.rsqrt(ss + _RMS_EPS)).reshape(B, L, C) \
                * qg.astype(jnp.float32)
        qh = q.reshape(B, L, num_heads, D)
        kh = k.reshape(B, -1, num_heads, D)
        vh = v.reshape(B, -1, num_heads, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(compute_dtype),
                       kh.astype(compute_dtype),
                       preferred_element_type=jnp.float32) * D ** -0.5
        p_ = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p_.astype(compute_dtype),
                          vh.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
        out = jnp.einsum("blc,cd->bld",
                         attn.reshape(B, L, C).astype(compute_dtype),
                         wo.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        return xf + out + bo.astype(jnp.float32)

    xf = one(xf, p1, kv1)
    if p2 is not None:
        xf = one(xf, p2, kv2)
    return xf.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _cross_sublayer(x, p1, kv1, p2, kv2, num_heads, rms, compute_dtype,
                    quant, interpret, lq_block, kv_buffers):
    return _cross_sublayer_fwd_impl(x, p1, kv1, p2, kv2, num_heads, rms,
                                    compute_dtype, quant, interpret,
                                    lq_block, kv_buffers)


def _cross_fwd(x, p1, kv1, p2, kv2, num_heads, rms, compute_dtype, quant,
               interpret, lq_block, kv_buffers):
    y = _cross_sublayer_fwd_impl(x, p1, kv1, p2, kv2, num_heads, rms,
                                 compute_dtype, quant, interpret, lq_block,
                                 kv_buffers)
    return y, (x, p1, kv1, p2, kv2)


def _cross_bwd(num_heads, rms, compute_dtype, quant, interpret, lq_block,
               kv_buffers, res, gy):
    x, p1, kv1, p2, kv2 = res
    f = functools.partial(cross_sublayer_reference, num_heads=num_heads,
                          rms=rms, compute_dtype=compute_dtype)
    if quant:
        # inference-only storage format: gradients don't flow into the int8
        # cache — recompute with dequantized floats for dx/dparams
        dq = lambda kv: (dequantize_kv(kv[0], kv[2].swapaxes(1, 2)),
                         dequantize_kv(kv[1], kv[3]))
        fkv1 = dq(kv1)
        fkv2 = dq(kv2) if kv2 is not None else None
        _, vjp = jax.vjp(lambda x, p1, p2: f(x, p1, fkv1, p2, fkv2), x, p1,
                         p2)
        dx, dp1, dp2 = vjp(gy)
        zeros = lambda kv: (tuple(jnp.zeros_like(a) for a in kv)
                            if kv is not None else None)
        return dx, dp1, zeros(kv1), dp2, zeros(kv2)
    _, vjp = jax.vjp(f, *res)
    return vjp(gy)


_cross_sublayer.defvjp(_cross_fwd, _cross_bwd)


def fused_cross_sublayer(x, p1, kv1, p2=None, kv2=None, *, num_heads: int,
                         rms: bool = False, compute_dtype=jnp.bfloat16,
                         quant: bool = False, interpret: bool = False,
                         lq_block: int = 0, kv_buffers: int = 2):
    """One or two chained un-gated cross-attention sublayers with affine
    pre-norms in one kernel (two: the DiT image + static-GS conditioning
    pair; one: the SLat torso's image cross).

    quant=True: kv_i = (k int8, v int8, k_scale, v_scale) from quantize_kv —
    halves the cache's HBM stream (the denoise's largest), ~0.5% kv error.
    lq_block/kv_buffers: see _cross_sublayer_fwd_impl (big-channel shapes)."""
    return _cross_sublayer(x, p1, kv1, p2, kv2, num_heads, rms,
                           compute_dtype, quant, interpret, lq_block,
                           kv_buffers)


def cross_sublayer_supports(B, L, C, num_heads, lk1, lk2) -> bool:
    D = C // num_heads
    lk1p, lk2p = _round_up(lk1, 128), _round_up(lk2, 128)
    # concurrent-liveness estimate (weights single-buffered via constant
    # index maps; score tiles serial per head group). The DiT shape
    # (L=512, C=512, lk=1370/512) lands at ~15.9 MB and compiles on v5e
    # (benchmarks/sublayer_bench.py) — the bound is calibrated to that.
    vmem_est = (
        2 * 2 * L * C * 2                      # x/y double-buffered
        + 2 * 2 * (lk1p + lk2p) * C * 2        # kv double-buffered
        + 4 * C * C * 2                        # wq/wo x2 (bf16, resident)
        + L * max(lk1p, lk2p) * 4              # score tile (per head-group)
    )
    return (
        C % _LANES == 0
        and _LANES % D == 0
        and L % 8 == 0
        and vmem_est <= 16 * 1024 * 1024
    )


# -- fused MLP sublayer ---------------------------------------------------------
#
#   y = x + gate * W2 @ gelu(W1 @ modulate(LN(x), shift, scale))


def _mlp_sublayer_kernel(x_ref, sh_ref, sc_ref, g_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, o_ref, *, compute_dtype):
    xf = x_ref[0].astype(jnp.float32)
    h = _layernorm_f32(xf)
    h = h * (1.0 + sc_ref[0, 0].astype(jnp.float32)[None, :]) \
        + sh_ref[0, 0].astype(jnp.float32)[None, :]
    m = jax.lax.dot_general(
        h.astype(compute_dtype), w1_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)[None, :]
    m = jax.nn.gelu(m, approximate=True)
    out = jax.lax.dot_general(
        m.astype(compute_dtype), w2_ref[...].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)[None, :]
    y = xf + out * g_ref[0, 0].astype(jnp.float32)[None, :]
    o_ref[0] = y.astype(o_ref.dtype)


def _mlp_sublayer_fwd_impl(x, sh, sc, gate, w1, b1, w2, b2, compute_dtype,
                           mod_repeat: int, interpret: bool):
    B, L, C = x.shape
    M = w1.shape[1]
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(_mlp_sublayer_kernel,
                               compute_dtype=compute_dtype)
    mr = mod_repeat
    vec = lambda: pl.BlockSpec((1, 1, C), lambda i: (i // mr, 0, 0),
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
            const((C, M)), const((1, M)),
            const((M, C)), const((1, C)),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * C * M,
            bytes_accessed=2 * B * L * C * x.dtype.itemsize,
            transcendentals=B * L * M,
        ),
        interpret=interpret,
    )(x, sh[:, None, :], sc[:, None, :], gate[:, None, :], w1, row(b1), w2,
      row(b2))


def mlp_sublayer_reference(x, sh, sc, gate, w1, b1, w2, b2,
                           compute_dtype=jnp.bfloat16):
    xf = x.astype(jnp.float32)
    h = _layernorm_f32(xf)
    h = h * (1.0 + sc.astype(jnp.float32)[:, None, :]) \
        + sh.astype(jnp.float32)[:, None, :]
    m = jnp.einsum("blc,cd->bld", h.astype(compute_dtype),
                   w1.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
    m = jax.nn.gelu(m + b1.astype(jnp.float32), approximate=True)
    out = jnp.einsum("bld,dc->blc", m.astype(compute_dtype),
                     w2.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    y = xf + out * gate.astype(jnp.float32)[:, None, :]
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _mlp_sublayer(x, sh, sc, gate, w1, b1, w2, b2, compute_dtype, mod_repeat,
                  interpret):
    return _mlp_sublayer_fwd_impl(x, sh, sc, gate, w1, b1, w2, b2,
                                  compute_dtype, mod_repeat, interpret)


def _mlp_fwd(x, sh, sc, gate, w1, b1, w2, b2, compute_dtype, mod_repeat,
             interpret):
    y = _mlp_sublayer_fwd_impl(x, sh, sc, gate, w1, b1, w2, b2,
                               compute_dtype, mod_repeat, interpret)
    return y, (x, sh, sc, gate, w1, b1, w2, b2)


def _mlp_bwd(compute_dtype, mod_repeat, interpret, res, gy):
    x, sh, sc, gate = res[0], res[1], res[2], res[3]
    rep = lambda a: jnp.repeat(a, mod_repeat, axis=0) if mod_repeat > 1 else a
    f = functools.partial(mlp_sublayer_reference, compute_dtype=compute_dtype)
    _, vjp = jax.vjp(f, x, rep(sh), rep(sc), rep(gate), *res[4:])
    grads = list(vjp(gy))
    if mod_repeat > 1:
        for i in (1, 2, 3):
            g = grads[i]
            grads[i] = g.reshape(-1, mod_repeat, g.shape[-1]).sum(axis=1)
    return tuple(grads)


_mlp_sublayer.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp_sublayer(x, sh, sc, gate, w1, b1, w2, b2, *,
                       compute_dtype=jnp.bfloat16, mod_repeat: int = 1,
                       interpret: bool = False):
    """Fused pre-norm modulated MLP sublayer (one HBM round-trip)."""
    return _mlp_sublayer(x, sh, sc, gate, w1, b1, w2, b2, compute_dtype,
                         mod_repeat, interpret)


def mlp_sublayer_supports(B, L, C, M) -> bool:
    # calibrated like cross_sublayer_supports: the DiT shape (L=512, C=512,
    # M=2048, ~12.6 MB concurrent) compiles and runs on v5e.
    vmem_est = (
        2 * 2 * L * C * 2       # x/y double-buffered
        + 2 * C * M * 2         # w1/w2 resident bf16
        + L * M * 4             # hidden f32 (gelu in fp32)
        + L * C * 4             # LN f32
    )
    return C % _LANES == 0 and M % _LANES == 0 and L % 8 == 0 \
        and vmem_est <= 16 * 1024 * 1024


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
