"""Kernel-design experiments for the fused narrow-head attention: isolate
where the time goes vs the 25%-MXU narrow-head ceiling (~49 TF/s effective).

Variants (all timed as a 20-rep lax.scan to bury the ~25-30 ms dispatch
floor):
  v2    — shipped kernel (bias-fold mask + ones-column MXU denominator)
  mm    — matmuls only (no exp2/softmax): isolates the VPU cost
  bb4   — 4 batch elements per grid cell (fewer, fatter cells): isolates
          per-cell/grid overhead
  noloop— single head per cell (grid B*H): isolates the serial-head loop

Run: python benchmarks/attn_variants_bench.py
"""

import functools
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import timeit

from gvfdiffusion_tpu.ops import fused_attention as fa

_LOG2E = 1.4426950408889634
_SHIFT = 30.0


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, head_dim, mode,
            batch_block=1):
    nh = q_ref.shape[2] // head_dim
    for b in range(batch_block):
        for h in range(nh):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[b, :, sl].astype(jnp.bfloat16)
            k = k_ref[b, :, sl].astype(jnp.bfloat16)
            v = v_ref[b, :, sl].astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * (scale * _LOG2E) - _SHIFT
            if mode == "mm":
                p = s.astype(jnp.bfloat16)
                o = jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[b, :, sl] = o.astype(o_ref.dtype)
            else:
                p = jnp.exp2(s).astype(jnp.bfloat16)
                v_aug = jnp.concatenate(
                    [v, jnp.ones((v.shape[0], 1), jnp.bfloat16)], axis=1)
                o = jax.lax.dot_general(
                    p, v_aug, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[b, :, sl] = (o[:, :head_dim] / o[:, head_dim:]).astype(
                    o_ref.dtype)


def run_variant(q, k, v, scale, mode="full", batch_block=1, head_block=8):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    lkp = _round_up(Lk, 128)
    q = q.reshape(B, Lq, H * D)
    k = k.reshape(B, Lk, H * D)
    v = v.reshape(B, Lk, H * D)
    if lkp != Lk:
        k = jnp.pad(k, [(0, 0), (0, lkp - Lk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, lkp - Lk), (0, 0)])
    hb = head_block
    lanes = hb * D
    bb = batch_block
    kernel = functools.partial(_kernel, scale=scale, head_dim=D, mode=mode,
                               batch_block=bb)
    out = pl.pallas_call(
        kernel,
        grid=(B // bb, H // hb),
        in_specs=[
            pl.BlockSpec((bb, Lq, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, Lq, lanes), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq * Lk * D,
            bytes_accessed=(2 * q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * Lq * lkp,
        ),
    )(q, k, v)
    return out.reshape(B, Lq, H, D)


def _dense_probe_kernel(q_ref, k_ref, v_ref, o_ref):
    # shape-probe: one full-lane [Lq,256]x[256,Lkp] + [Lq,Lkp]x[Lkp,256]
    # matmul pair per cell — logically meaningless, measures the achievable
    # MXU slot rate for a consolidated kernel at these tile shapes
    q = q_ref[0].astype(jnp.bfloat16)          # [Lq, 256]
    k = k_ref[0].astype(jnp.bfloat16)          # [Lkp, 256]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = s.astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def run_dense_probe(q, k, v, scale):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    lkp = _round_up(Lk, 128)
    q = q.reshape(B, Lq, H * D)
    k = k.reshape(B, Lk, H * D)
    v = v.reshape(B, Lk, H * D)
    if lkp != Lk:
        k = jnp.pad(k, [(0, 0), (0, lkp - Lk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, lkp - Lk), (0, 0)])
    hb = 8
    lanes = hb * D
    out = pl.pallas_call(
        _dense_probe_kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * D), q.dtype),
    )(q, k, v)
    return out.reshape(B, Lq, H, D)


def _bd4_kernel(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref, *, scale,
                head_dim, kv_len):
    """4 heads consolidated per matmul: block-diagonal K/V spreads give one
    [Lq,128]x[128,4Lkp] QK and one [Lq,4Lkp]x[4Lkp,128] AV at full 128-deep
    contraction / 128-lane output."""
    Lq = q_ref.shape[1]
    Lkp = k_ref.shape[1]
    G = 4
    # the diagonal spread: head j's k/v [Lkp, 32-lane slice j] lands at row
    # offset j*Lkp, SAME lane slice — a pure sublane-offset copy. Off-diagonal
    # zeros are never written after the first cell zeroes the scratch.
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        kbd_ref[...] = jnp.zeros_like(kbd_ref)
        vbd_ref[...] = jnp.zeros_like(vbd_ref)

    for j in range(G):
        sl = slice(j * head_dim, (j + 1) * head_dim)
        kbd_ref[j * Lkp:(j + 1) * Lkp, sl] = k_ref[0, :, sl]
        vbd_ref[j * Lkp:(j + 1) * Lkp, sl] = v_ref[0, :, sl]

    q4 = q_ref[0].astype(jnp.bfloat16)                       # [Lq, 128]
    kbd = kbd_ref[...].astype(jnp.bfloat16)                  # [4Lkp, 128]
    s = jax.lax.dot_general(q4, kbd, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [Lq, 4Lkp]
    s = s * (scale * _LOG2E) - _SHIFT
    if kv_len < Lkp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % Lkp
        s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp2(s)
    denom = jnp.sum(p.reshape(Lq, G, Lkp), axis=-1)          # [Lq, 4]
    o = jax.lax.dot_general(p.astype(jnp.bfloat16), vbd_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [Lq, 128]
    o = o / jnp.repeat(denom, head_dim, axis=1)
    o_ref[0] = o.astype(o_ref.dtype)


def run_bd4(q, k, v, scale):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    lkp = _round_up(Lk, 128)
    q = q.reshape(B, Lq, H * D)
    k = k.reshape(B, Lk, H * D)
    v = v.reshape(B, Lk, H * D)
    if lkp != Lk:
        k = jnp.pad(k, [(0, 0), (0, lkp - Lk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, lkp - Lk), (0, 0)])
    hb = 4
    lanes = hb * D  # 128
    kernel = functools.partial(_bd4_kernel, scale=scale, head_dim=D,
                               kv_len=Lk)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, lanes), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, lanes), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((4 * lkp, lanes), jnp.bfloat16),
            pltpu.VMEM((4 * lkp, lanes), jnp.bfloat16),
        ],
    )(q, k, v)
    return out.reshape(B, Lq, H, D)


def main():
    B, H, D = 96, 16, 32
    REPS = 20
    dt = jnp.bfloat16
    for name, lq, lk in [("spatial", 512, 512), ("img_cross", 512, 1370)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, lq, H, D), dt)
        k = jax.random.normal(ks[1], (B, lk, H, D), dt)
        v = jax.random.normal(ks[2], (B, lk, H, D), dt)
        flops = 4 * B * H * lq * lk * D

        def bench(call, label):
            @jax.jit
            def fn(q, k, v):
                def body(x, _):
                    return call(x, k, v), None
                return jax.lax.scan(body, q, None, length=REPS)[0]

            t = timeit(lambda: fn(q, k, v), iters=5) / REPS
            print(f"{name:10s} {label:22s} {t*1e3:7.2f} ms  "
                  f"{flops/t/1e12:6.1f} TF/s")

        def safe_bench(call, label):
            try:
                bench(call, label)
            except Exception as e:
                print(f"{name:10s} {label:22s} FAILED: {type(e).__name__}")

        safe_bench(lambda x, k, v: fa.fused_attention(x, k, v, D**-0.5),
              "shipped-v2")
        safe_bench(lambda x, k, v: run_variant(x, k, v, D**-0.5, mode="mm"),
              "mm-only")
        safe_bench(lambda x, k, v: run_variant(x, k, v, D**-0.5, mode="full",
                                          batch_block=4), "batch-block-4")
        safe_bench(lambda x, k, v: run_variant(x, k, v, D**-0.5, mode="full",
                                          batch_block=8), "batch-block-8")
        safe_bench(lambda x, k, v: run_variant(x, k, v, D**-0.5, mode="full",
                                          head_block=16), "head-block-16")
        safe_bench(lambda x, k, v: run_dense_probe(x, k, v, D**-0.5),
                   "dense-slot-probe")
        safe_bench(lambda x, k, v: run_bd4(x, k, v, D**-0.5),
                   "blockdiag-4head")


if __name__ == "__main__":
    main()
