"""Per-component timing of the DiT denoise step at inference shapes.

One 32-step denoise = 32 model calls on the 3-way-CFG batch. This script
times each sub-component of one model call standalone (same modules, same
shapes, same dtype as bench.py's build_denoise) so optimization effort goes
where the milliseconds are. Components x12 blocks + input/final should
roughly add up to the measured full call; the gap is fusion/overhead.

Run: python benchmarks/denoise_breakdown.py
"""

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

from microbench import timeit


def main():
    from gvfdiffusion_tpu.nn.attention import MultiHeadAttention
    import flax.linen as nn

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    B, T, N, C, H = 3, 32, 512, 512, 16    # 3-way CFG batch
    L_IMG, N_STATIC = 1370, 512
    BT = B * T

    k = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}  dtype={dtype.__name__}")
    rows = []

    def bench(name, module, *args, per_block=True):
        params = module.init(k, *args)
        f = jax.jit(lambda p, *a: module.apply(p, *a))
        t = timeit(lambda: f(params, *args), iters=5, warmup=2)
        rows.append((name, t * 1e3, per_block))
        print(f"  {name:<22} {t*1e3:8.2f} ms")

    x_bt = jax.random.normal(k, (BT, N, C), dtype)
    print("== per-block components (x12 in the model) ==")

    mha = dict(qkv_bias=True, dtype=dtype)
    bench("spatial_self", MultiHeadAttention(
        C, H, attn_type="self", qk_rms_norm=True, **mha), x_bt)

    x_tmp = jax.random.normal(k, (B * N, T, C), dtype)
    bench("temporal_self", MultiHeadAttention(
        C, H, attn_type="self", qk_rms_norm=True, **mha), x_tmp)

    ctx_img = jax.random.normal(k, (BT, L_IMG, C), dtype)
    bench("image_cross", MultiHeadAttention(
        C, H, ctx_channels=C, attn_type="cross", **mha), x_bt, ctx_img)

    ctx_st = jax.random.normal(k, (BT, N_STATIC, C), dtype)
    bench("static_cross", MultiHeadAttention(
        C, H, ctx_channels=C, attn_type="cross", **mha), x_bt, ctx_st)

    class Mlp(nn.Module):
        @nn.compact
        def __call__(self, h):
            h = nn.Dense(4 * C, dtype=dtype)(h)
            h = nn.gelu(h)
            return nn.Dense(C, dtype=dtype)(h)

    bench("mlp_4x", Mlp(), x_bt)

    class NormsAndMod(nn.Module):
        @nn.compact
        def __call__(self, h, mod):
            m = nn.Dense(9 * C, dtype=dtype)(nn.silu(mod))
            ch = jnp.split(m, 9, axis=-1)
            for i in range(3):
                hn = nn.LayerNorm(use_bias=False, use_scale=False,
                                  dtype=jnp.float32)(h)
                h = h + hn * (1 + ch[3 * i][:, None]) * ch[3 * i + 1][:, None]
            return h

    mod = jax.random.normal(k, (BT, C), dtype)
    bench("norms+adaLN(3x)", NormsAndMod(), x_bt, mod)

    print("== full model call (1 of 32 steps, cross-KV cached) ==")
    sys.path.insert(0, _ROOT)
    import bench as bench_mod

    sample, noise, params, cond = bench_mod.build_denoise()
    # one full denoise (32 steps); divide for per-step
    t_full = timeit(lambda: sample(noise, params, cond), iters=2, warmup=1)
    print(f"  32-step denoise       {t_full*1e3:8.0f} ms "
          f"({t_full/32*1e3:.1f} ms/step)")

    per_block = sum(ms for _, ms, pb in rows if pb)
    print(f"\n  sum(per-block)x12 = {per_block*12:.1f} ms/step vs measured "
          f"{t_full/32*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
