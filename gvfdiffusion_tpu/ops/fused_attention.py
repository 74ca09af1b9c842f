"""Fused narrow-head attention — Pallas TPU kernel for the DiT hot loop.

The GVF model family uses head_dim=32 (configs/diffusion.yml: 512ch/16heads);
the unfused path materializes the score matrix S=[B*T, H, Lq, Lk] to HBM three
times per attention (write S, read+write softmax, read P). At the reference
inference shapes (3-way CFG x 32 frames, Lq=512, Lk=1370 DINOv2 tokens,
reference hot loop model/dpmsolver.py:1188-1230 -> model/dit.py:227-278) that
dominates the denoise latency.

Measured design decisions (v5e, this repo's microbenches):
  - Layout [B, L, H*D] with HEADS PACKED INTO LANES: a per-(batch, head)
    block [1, 1, L, 32] DMA-streams at ~60 GB/s (lane padding + tiny blocks);
    a lane-dense [1, L, 256] 8-head block streams ~4x faster. No transposes.
  - Whole-S-in-VMEM per head (no online softmax): at Lq<=2k, Lk<=4k the
    [Lq, Lk] fp32 tile fits easily; softmax cost is fully hidden behind the
    matmuls (mm-only == full-kernel latency, measured).
  - Constant-shift exp2 softmax: the shift cancels in normalization, so the
    row-max pass is unnecessary; scale*log2(e) folds into the QK epilogue.
  - bf16 matmuls, fp32 accumulation (matches the reference's fp16
    flash-attention numerics, model/attention/full_attn.py).

Result: spatial-self (Lq=Lk=512) 8.2 -> 2.9 ms, image-cross (Lk=1370)
19.5 -> 7.8 ms vs jax.nn.dot_product_attention on one v5e chip.

Backward: custom_vjp with a standard XLA einsum gradient (training keeps the
status-quo path; the fwd kernel is the inference win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lq beyond one VMEM-resident row block is gridded (see _lq_block); Lk is the
# remaining single-block limit — the kernel holds the whole key extent per
# instance. S fp32 bytes per instance = lq_blk*Lk_pad*4.
MAX_LK = 4096
_LANES = 128
_LOG2E = 1.4426950408889634
# exp2 argument shift; cancels in the softmax normalization. Safe for any
# |scaled logit| <= ~90 in fp32 — far beyond trained-transformer logits.
_SHIFT = 30.0
# VMEM budget for the per-instance S (fp32) + P (bf16) score tiles. ~16 MB
# per core total; leave room for double-buffered q/k/v/o blocks.
_SCORE_BYTES = 8 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# benchmark overrides (benchmarks/attn_kernel_bench.py): None = heuristic
_FORCE_LQ_BLK: int | None = None
_FORCE_HEAD_BLK: int | None = None
# measure-only: exponentiate in bf16 (halves the softmax VPU passes; ~1%
# relative softmax error — not for parity paths)
_EXP_BF16 = False
# global quantization override for end-to-end measurement ("qk" / "qk+av");
# None honors each call's `quant` argument
_FORCE_QUANT: str | None = None


def _lq_block(lq: int, lk_pad: int) -> int:
    """Query rows per grid instance: largest power-of-two block <= 1024 whose
    score tiles (S fp32 + P bf16 = 6 bytes/elem) fit the VMEM budget."""
    if _FORCE_LQ_BLK is not None:
        return min(_FORCE_LQ_BLK, lq)
    blk = 1024
    while blk > 8 and (blk * lk_pad * 6 > _SCORE_BYTES or blk > lq):
        blk //= 2
    return blk


def _head_block(num_heads: int, head_dim: int) -> int:
    """Heads per grid instance: largest group whose lane width is a multiple
    of 128 (or the full head set), capped at 256 lanes to bound the
    double-buffered k/v block footprint at large Lk."""
    if _FORCE_HEAD_BLK is not None:
        return _FORCE_HEAD_BLK
    for hb in (8, 4, 2, 1):
        if (
            hb <= num_heads
            and num_heads % hb == 0
            and (hb * head_dim) % _LANES == 0
            and hb * head_dim <= 2 * _LANES
        ):
            return hb
    return num_heads  # lanes == H*D (full-array block; always legal)


# Dense-packed head dispatch (round 5): the per-head loop below slices 32 of
# 256 lanes per head and issues 32-deep NT matmuls — 25% MXU depth plus
# sub-lane extract/insert relayouts, measured 17-22 TF/s vs the ~49 TF/s
# structural ceiling. The dense-packed path instead computes, per 128-lane
# group, S_h = dot(where(lane//D == h, q, 0), k) over the FULL 128-lane
# contraction: the masked-out lanes contribute exactly 0, so the result is
# bit-identical math, but every matmul is a full-width dense MXU op with no
# lane slicing. AV likewise runs P_h @ V at full lane width and selects head
# h's output block. MAC count is 128/D x the useful work — the same waste the
# ceiling argument already prices in — issued at full MXU rate.
_DENSE_PACKED = True


def _attn_kernel_dense(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                       head_dim: int, compute_dtype, segment_size: int = 0):
    # refs: q/o [1, Lq, hb*D]; k/v [1, Lk_pad, hb*D]; bias [1, 1, Lk_pad].
    # Requires 128 % head_dim == 0 (dispatch guarantees it).
    lanes = q_ref.shape[2]
    hpg = _LANES // head_dim  # heads per 128-lane group
    bias = bias_ref[0, 0, :]
    seg_mask = None
    if segment_size:
        row_off = pl.program_id(2) * q_ref.shape[1]
        shape = (q_ref.shape[1], k_ref.shape[1])
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row_off
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        seg_mask = row // segment_size == col // segment_size
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1) // head_dim
    for g in range(lanes // _LANES):
        gsl = slice(g * _LANES, (g + 1) * _LANES)
        q = q_ref[0, :, gsl].astype(compute_dtype)  # [Lq, 128]
        k = k_ref[0, :, gsl].astype(compute_dtype)  # [Lk_pad, 128]
        v = v_ref[0, :, gsl].astype(compute_dtype)
        o_acc = jnp.zeros((q.shape[0], _LANES), jnp.float32)
        d_acc = jnp.zeros((q.shape[0], _LANES), jnp.float32)
        for h in range(hpg):
            sel = lane == h
            qm = jnp.where(sel, q, jnp.zeros((), compute_dtype))
            s = jax.lax.dot_general(
                qm, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Lq, Lk_pad] — full 128-deep contraction, head-exact
            s = s * (scale * _LOG2E) - bias[None, :]
            if seg_mask is not None:
                s = jnp.where(seg_mask, s, -jnp.inf)
            p32 = jnp.exp2(s)
            denom = jnp.sum(p32, axis=-1, keepdims=True)  # [Lq, 1]
            o_h = jax.lax.dot_general(
                p32.astype(compute_dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Lq, 128]; only head h's D-lane block is meaningful
            o_acc = o_acc + jnp.where(sel, o_h, 0.0)
            d_acc = d_acc + jnp.where(sel, denom, 0.0)
        # max() keeps fully-masked query rows finite (0/eps = 0) — the
        # sparse callers' contract is garbage-but-finite on invalid rows.
        o_ref[0, :, gsl] = (o_acc / jnp.maximum(d_acc, 1e-30)).astype(
            o_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 head_dim: int, compute_dtype, segment_size: int = 0,
                 quant: str = ""):
    # refs: q/o [1, Lq, hb*D]; k/v [1, Lk_pad, hb*D] — heads packed in lanes;
    # bias [1, Lk_pad] = _SHIFT on valid columns, +inf on kv padding — the
    # column mask rides the scale epilogue as ONE fused multiply-subtract
    # pass (exp2(-inf) == 0) instead of a separate iota+where pass over S.
    #
    # quant: "" (bf16), "qk" (int8 QK with per-head dynamic scales, fp32-exact
    # epilogue), or "qk+av" (int8 P.V too: row-max-normalized P quantized to
    # 127 steps, ones column carries the denominator so the dequant scales
    # cancel). int8 runs the MXU at 2x the bf16 rate — the last denoise lever
    # BENCH_NOTES names; error bounds measured in tests/test_fused_attention.
    nh = q_ref.shape[2] // head_dim
    bias = bias_ref[0, 0, :]
    for h in range(nh):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl].astype(compute_dtype)
        k = k_ref[0, :, sl].astype(compute_dtype)
        v = v_ref[0, :, sl].astype(compute_dtype)
        if quant:
            # per-(head, block) dynamic symmetric scales; zeros on kv padding
            # quantize to 0 so the bias mask still handles validity
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qm = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6)
            km = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6)
            qi = jnp.round(qf * (127.0 / qm)).astype(jnp.int8)
            ki = jnp.round(kf * (127.0 / km)).astype(jnp.int8)
            s = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * ((qm * km / (127.0 * 127.0)) * scale * _LOG2E) - bias[None, :]
        else:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Lq, Lk_pad]
            s = s * (scale * _LOG2E) - bias[None, :]
        if segment_size:
            # block-diagonal mask: sequence-packed independent segments
            # (e.g. 16 temporal rows of T=32 packed into one 512 sequence).
            # Row indices are global: the Lq axis may be gridded into blocks.
            row_off = pl.program_id(2) * q_ref.shape[1]
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + row_off
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row // segment_size == col // segment_size,
                          s, -jnp.inf)
        if quant == "qk+av":
            # row-max normalization (re-introduces the max pass the bf16
            # kernel elides) so P in (0,1] survives 127-step quantization;
            # fully-masked rows: max = -inf -> s - m = nan; guard with 0
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(jnp.maximum(s - m, -126.0))
            pi = jnp.round(p * 127.0).astype(jnp.int8)
            vf = v.astype(jnp.float32)
            vm = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-6)
            vi = jnp.round(vf * (127.0 / vm)).astype(jnp.int8)
            vi_aug = jnp.concatenate(
                [vi, jnp.full((vi.shape[0], 1), 127, jnp.int8)], axis=1
            )
            o = jax.lax.dot_general(
                pi, vi_aug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)  # [Lq, D+1]
            denom = jnp.maximum(o[:, head_dim:], 1.0)
            # dequant scales cancel in the ratio; ones column absorbs 1/vm
            o_ref[0, :, sl] = (
                o[:, :head_dim] / denom * vm).astype(o_ref.dtype)
            continue
        if _EXP_BF16:
            p = jnp.exp2(s.astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s).astype(compute_dtype)
        # softmax denominator on the MXU: a ones-column appended to V lands
        # the row-sum of P in lane D of the AV product — the output tile pads
        # 32->128 lanes anyway, so the extra column is free and the VPU
        # [Lq, Lk] reduction pass disappears.
        v_aug = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), compute_dtype)], axis=1
        )
        o = jax.lax.dot_general(
            p, v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Lq, D+1]
        # max() keeps fully-masked query rows finite (0/eps = 0) — the
        # sparse callers' contract is garbage-but-finite on invalid rows.
        denom = jnp.maximum(o[:, head_dim:], 1e-30)
        o_ref[0, :, sl] = (o[:, :head_dim] / denom).astype(o_ref.dtype)


def _fused_attention_fwd_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    compute_dtype=jnp.bfloat16, interpret: bool = False,
    segment_size: int = 0, kv_bias: jnp.ndarray | None = None,
    quant: str = "",
) -> jnp.ndarray:
    """q [B, Lq, H, D]; k, v [B, Lk, H, D] -> [B, Lq, H, D].

    segment_size > 0: queries/keys are sequence-packed independent segments
    of that length (requires Lq == Lk and both multiples of segment_size);
    attention is masked block-diagonal.

    kv_bias [B, Lk] float: additive pre-softmax logit bias per key (0 keeps a
    key, -inf masks it) — how ragged kv validity rides the kernel's fused
    scale epilogue instead of a separate mask pass over S."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    lk_pad = _round_up(Lk, 128)
    lq_blk = _lq_block(Lq, lk_pad)
    lq_pad = _round_up(Lq, lq_blk)
    q = q.reshape(B, Lq, H * D)
    k = k.reshape(B, Lk, H * D)
    v = v.reshape(B, Lk, H * D)
    if lq_pad != Lq:
        q = jnp.pad(q, [(0, 0), (0, lq_pad - Lq), (0, 0)])
    if lk_pad != Lk:
        pad = [(0, 0), (0, lk_pad - Lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    hb = _head_block(H, D)
    lanes = hb * D
    col_pad = jnp.where(jnp.arange(lk_pad) < Lk, _SHIFT, jnp.inf)[None, :]
    if kv_bias is not None:
        col_pad = col_pad - jnp.pad(
            kv_bias.astype(jnp.float32), [(0, 0), (0, lk_pad - Lk)]
        ) * _LOG2E
    # [B, 1, lk_pad]: the trailing (1, lk_pad) block exactly matches the
    # array's last two dims (Pallas requires 8/128-divisible OR full-extent)
    bias = jnp.broadcast_to(col_pad, (B, lk_pad)).astype(jnp.float32)
    bias = bias[:, None, :]
    eff_quant = quant if _FORCE_QUANT is None else _FORCE_QUANT
    if (_DENSE_PACKED and not eff_quant and _LANES % D == 0
            and (hb * D) % _LANES == 0):
        kernel = functools.partial(
            _attn_kernel_dense, scale=scale, head_dim=D,
            compute_dtype=compute_dtype, segment_size=segment_size,
        )
    else:
        kernel = functools.partial(
            _attn_kernel, scale=scale, head_dim=D,
            compute_dtype=compute_dtype, segment_size=segment_size,
            quant=eff_quant,
        )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hb, lq_pad // lq_blk),
        in_specs=[
            pl.BlockSpec((1, lq_blk, lanes), lambda b, g, r: (b, r, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, lanes), lambda b, g, r: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, lanes), lambda b, g, r: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk_pad), lambda b, g, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_blk, lanes), lambda b, g, r: (b, r, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, lq_pad, H * D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Lq * Lk * D,
            bytes_accessed=(q.size + 2 * k.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * lk_pad,
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :Lq].reshape(B, Lq, H, D)


def _zero_bias(q, k):
    return jnp.zeros((q.shape[0], k.shape[1]), jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused_attention_vjp(q, k, v, scale: float, compute_dtype,
                         interpret: bool, segment_size: int, quant: str,
                         kv_bias):
    return _fused_attention_fwd_impl(q, k, v, scale, compute_dtype, interpret,
                                     segment_size, kv_bias, quant)


def _fwd(q, k, v, scale, compute_dtype, interpret, segment_size, quant,
         kv_bias):
    out = _fused_attention_fwd_impl(q, k, v, scale, compute_dtype, interpret,
                                    segment_size, kv_bias, quant)
    return out, (q, k, v, kv_bias)


def _bwd(scale, compute_dtype, interpret, segment_size, quant, res, g):
    # standard attention gradient, XLA einsums in fp32 (training path keeps
    # the pre-kernel numerics; the fwd kernel is the inference win)
    q, k, v, kv_bias = res
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + kv_bias[:, None, None, :]
    if segment_size:
        row = jnp.arange(s.shape[-2])[:, None]
        col = jnp.arange(s.shape[-1])[None]
        s = jnp.where(row // segment_size == col // segment_size, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dbias = jnp.sum(ds, axis=(1, 2)).astype(kv_bias.dtype)
    ds = ds * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds.astype(q.dtype), k)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds.astype(k.dtype), q)
    return dq, dk, dv, dbias


_fused_attention_vjp.defvjp(_fwd, _bwd)


def fused_attention(q, k, v, scale: float, compute_dtype=jnp.bfloat16,
                    interpret: bool = False, segment_size: int = 0,
                    kv_bias=None, quant: str = ""):
    """Softmax attention, [B, Lq, H, D] layout, fused on TPU via Pallas.

    kv_bias [B, Lk] float (optional): additive pre-softmax logit bias per
    key; -inf masks a key (ragged kv validity).

    quant: "" | "qk" | "qk+av" — int8 MXU quantization of the QK and/or P.V
    contractions (inference only; the backward pass keeps fp32 numerics)."""
    if kv_bias is None:
        kv_bias = _zero_bias(q, k)
    return _fused_attention_vjp(q, k, v, scale, compute_dtype, interpret,
                                segment_size, quant, kv_bias)


def supports(q_shape, k_shape) -> bool:
    """Static check: does the (Lq-gridded, whole-Lk) kernel cover these?
    Ragged Lq is padded to the row-block internally and Lk padding is masked
    via the bias row, so only the extents matter (e.g. DINOv2's L=1374
    token sequence routes here; its old jax.nn.dot_product_attention
    fallback materialized [B,H,L,L] fp32 logits — 3.9 GB at the 32-frame
    video-encode shape)."""
    _, Lq, H, D = q_shape
    Lk = k_shape[1]
    return (
        Lq >= 128  # tiny L (e.g. temporal T=32): grid overhead
        and 128 <= Lk <= MAX_LK  # dwarfs the work — XLA path wins there
        and D <= 128
        and D % 8 == 0
        and (H * D) % _LANES == 0
    )


# -- temporal attention kernel ------------------------------------------------
#
# The DiT temporal branch attends over T=32 frames for each of B*N*H
# (3*512*16 = 24.6k) tiny sequences. As an XLA batched einsum the
# [32,32]x[32,32] matmul instances use ~1/16 of an MXU tile each and the
# operands need [B,N,H,T,D] relayouts — measured 68 ms per DiT call
# (benchmarks/dit_profile.py), ~0.1% MFU for 0.05 TFLOP of math.
#
# This kernel keeps the NATIVE [B, T, N, C] layout (no transposes at all)
# and packs NC=8 voxels into the matmul M/N dimensions (NC=8 satisfies the
# Pallas block-shape rule: second-to-last block dim divisible by 8): per
# grid cell (b, group of NC voxels) the [T*NC, C] q/k tiles give, per head,
# a [256, 32] x [256, 32]^T = [256, 256] MXU op whose cross-voxel quadrant
# garbage is masked before the (exp2, shift-free) softmax; AV is a second
# [256,256]x[256,32] op. 16 heads loop serially but each iteration is a
# full-width MXU op — vs 16 sixteenth-width ops in the einsum form.

# voxels packed per grid cell: measured 3.35 ms (NC=8) vs 3.11 ms (NC=16)
# per full-shape call on v5e (benchmarks/attn_tune_bench.py); NC=32 exceeds
# scoped VMEM (S[1024,1024] fp32 + refs).
_TEMPORAL_NC = 16


def _temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     head_dim: int, compute_dtype):
    # refs [1, T, NC, C]; rows flatten to (t, n)
    _, T, NC, C = q_ref.shape
    R = T * NC
    q = q_ref[0].reshape(R, C)
    k = k_ref[0].reshape(R, C)
    v = v_ref[0].reshape(R, C)
    r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    same_n = (r % NC) == (c % NC)
    for h in range(C // head_dim):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl].astype(compute_dtype)
        kh = k[:, sl].astype(compute_dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, R]
        s = s * (scale * _LOG2E) - _SHIFT
        s = jnp.where(same_n, s, -jnp.inf)
        p = jnp.exp2(s)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(compute_dtype), v[:, sl].astype(compute_dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [R, head_dim]
        o_ref[0, :, :, sl] = (o / denom).reshape(T, NC, head_dim).astype(
            o_ref.dtype)


def _temporal_attention_impl(q, k, v, scale: float,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False):
    """q, k, v: [B, T, N, H, D] -> [B, T, N, H, D]; attention over axis T
    independently per (b, n, h)."""
    B, T, N, H, D = q.shape
    C = H * D
    nc = _TEMPORAL_NC
    while N % nc:  # small N (tests/toy shapes): largest divisor <= default
        nc //= 2
    q = q.reshape(B, T, N, C)
    k = k.reshape(B, T, N, C)
    v = v.reshape(B, T, N, C)
    kernel = functools.partial(
        _temporal_kernel, scale=scale, head_dim=D,
        compute_dtype=compute_dtype,
    )
    spec = pl.BlockSpec((1, T, nc, C), lambda b, g: (b, 0, g, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, N // nc),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, N, C), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * N * T * T * D * nc,
            bytes_accessed=4 * B * T * N * C * q.dtype.itemsize,
            transcendentals=B * H * N * T * T * nc,
        ),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(B, T, N, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def temporal_attention(q, k, v, scale: float, compute_dtype=jnp.bfloat16,
                       interpret: bool = False):
    """Per-(b,n,h) attention over T in native [B, T, N, H, D] layout."""
    return _temporal_attention_impl(q, k, v, scale, compute_dtype, interpret)


def _temporal_fwd(q, k, v, scale, compute_dtype, interpret):
    return _temporal_attention_impl(q, k, v, scale, compute_dtype,
                                    interpret), (q, k, v)


def _temporal_bwd(scale, compute_dtype, interpret, res, g):
    # training path: standard XLA einsum gradient (the kernel is the
    # inference win; backward keeps pre-kernel numerics)
    q, k, v = res
    s = jnp.einsum("btnhd,bsnhd->bnhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bnhts,btnhd->bsnhd", p.astype(g.dtype), g)
    dp = jnp.einsum("btnhd,bsnhd->bnhts", g, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bnhts,bsnhd->btnhd", ds.astype(q.dtype), k)
    dk = jnp.einsum("bnhts,btnhd->bsnhd", ds.astype(k.dtype), q)
    return dq, dk, dv


temporal_attention.defvjp(_temporal_fwd, _temporal_bwd)


def temporal_supports(q_shape) -> bool:
    B, T, N, H, D = q_shape
    nc = _TEMPORAL_NC
    while nc and N % nc:
        nc //= 2
    return (
        nc >= 1
        and T * nc % 8 == 0
        and (H * D) % _LANES == 0
        and D % 8 == 0
        and T * nc <= 1024  # S tile [R, R] fp32 in VMEM
    )
