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

# Shapes the single-block kernel accepts; beyond these the caller should use
# the XLA path (or a future streaming variant). S fp32 bytes = Lq*Lk_pad*4.
MAX_LQ = 2048
MAX_LK = 4096
_LANES = 128
_LOG2E = 1.4426950408889634
# exp2 argument shift; cancels in the softmax normalization. Safe for any
# |scaled logit| <= ~90 in fp32 — far beyond trained-transformer logits.
_SHIFT = 30.0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _head_block(num_heads: int, head_dim: int) -> int:
    """Heads per grid instance: largest group whose lane width is a multiple
    of 128 (or the full head set), capped to keep VMEM in budget."""
    for hb in (8, 4, 2, 1):
        if hb <= num_heads and num_heads % hb == 0 and (hb * head_dim) % _LANES == 0:
            return hb
    return num_heads  # lanes == H*D (full-array block; always legal)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                 head_dim: int, compute_dtype, segment_size: int = 0):
    # refs: q/o [1, Lq, hb*D]; k/v [1, Lk_pad, hb*D] — heads packed in lanes
    nh = q_ref.shape[2] // head_dim
    for h in range(nh):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, sl].astype(compute_dtype)
        k = k_ref[0, :, sl].astype(compute_dtype)
        v = v_ref[0, :, sl].astype(compute_dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Lq, Lk_pad]
        s = s * (scale * _LOG2E) - _SHIFT
        if segment_size:
            # block-diagonal mask: sequence-packed independent segments
            # (e.g. 16 temporal rows of T=32 packed into one 512 sequence)
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(row // segment_size == col // segment_size,
                          s, -jnp.inf)
        if kv_len < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -jnp.inf)
        p = jnp.exp2(s).astype(compute_dtype)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Lq, D]
        o_ref[0, :, sl] = (o / denom).astype(o_ref.dtype)


def _fused_attention_fwd_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    compute_dtype=jnp.bfloat16, interpret: bool = False,
    segment_size: int = 0,
) -> jnp.ndarray:
    """q [B, Lq, H, D]; k, v [B, Lk, H, D] -> [B, Lq, H, D].

    segment_size > 0: queries/keys are sequence-packed independent segments
    of that length (requires Lq == Lk and both multiples of segment_size);
    attention is masked block-diagonal."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    lk_pad = _round_up(Lk, 128)
    q = q.reshape(B, Lq, H * D)
    k = k.reshape(B, Lk, H * D)
    v = v.reshape(B, Lk, H * D)
    if lk_pad != Lk:
        pad = [(0, 0), (0, lk_pad - Lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    hb = _head_block(H, D)
    lanes = hb * D
    kernel = functools.partial(
        _attn_kernel, scale=scale, kv_len=Lk, head_dim=D,
        compute_dtype=compute_dtype, segment_size=segment_size,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * Lq * Lk * D,
            bytes_accessed=(q.size + 2 * k.size + q.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * lk_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out.reshape(B, Lq, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_attention(q, k, v, scale: float, compute_dtype=jnp.bfloat16,
                    interpret: bool = False, segment_size: int = 0):
    """Softmax attention, [B, Lq, H, D] layout, fused on TPU via Pallas."""
    return _fused_attention_fwd_impl(q, k, v, scale, compute_dtype, interpret,
                                     segment_size)


def _fwd(q, k, v, scale, compute_dtype, interpret, segment_size):
    out = _fused_attention_fwd_impl(q, k, v, scale, compute_dtype, interpret,
                                    segment_size)
    return out, (q, k, v)


def _bwd(scale, compute_dtype, interpret, segment_size, res, g):
    # standard attention gradient, XLA einsums in fp32 (training path keeps
    # the pre-kernel numerics; the fwd kernel is the inference win)
    q, k, v = res
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if segment_size:
        row = jnp.arange(s.shape[-2])[:, None]
        col = jnp.arange(s.shape[-1])[None]
        s = jnp.where(row // segment_size == col // segment_size, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds * scale
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds.astype(q.dtype), k)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds.astype(k.dtype), q)
    return dq, dk, dv


fused_attention.defvjp(_fwd, _bwd)


def supports(q_shape, k_shape) -> bool:
    """Static check: does the single-block kernel cover these shapes?"""
    _, Lq, H, D = q_shape
    Lk = k_shape[1]
    return (
        Lq % 8 == 0
        and 128 <= Lq <= MAX_LQ  # tiny L (e.g. temporal T=32): grid overhead
        and 128 <= Lk <= MAX_LK  # dwarfs the work — XLA path wins there
        and D <= 128
        and D % 8 == 0
        and (H * D) % _LANES == 0
    )
