"""Denoise ablations: quantify each component by removing it and timing the
FULL 32-step program (whole-program deltas are the only trustworthy signal
on this backend — see denoise_breakdown.py).

  full           the shipped configuration (fused attention kernel)
  xla-attn       fused kernel off (GVF_ATTN=xla equivalent)
  no-temporal    DiT without the temporal attention branch
  single-call    one 3-CFG model forward (scan overhead = 32x this vs full)

Run: python benchmarks/denoise_ablations.py
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


def build(no_temporal=False, temporal_layout="transpose"):
    from gvfdiffusion_tpu.diffusion.dpm_solver import (
        DPMSolver, NoiseScheduleVP, model_wrapper)
    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import (
        get_named_beta_schedule)
    from gvfdiffusion_tpu.models.dit import DiT

    B, T, N, C = 1, 32, 512, 16
    L, Ns = 1370, 512
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    model = DiT(
        resolution=N, in_channels=C, model_channels=512,
        static_cond_channels=14, image_cond_channels=1024, out_channels=C,
        num_blocks=12, num_heads=16, pe_mode="ape", qk_rms_norm=True,
        no_temporal_attn=no_temporal, temporal_layout=temporal_layout,
        dtype=dtype,
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, T, N, C))
    cond = dict(
        cond_images=jax.random.normal(ks[1], (B, T, L, 1024), dtype),
        static_latent=jax.random.normal(ks[2], (B, Ns, 14)),
        positions=jax.random.uniform(ks[3], (B, N, 3)),
    )
    params = model.init(ks[4], x, jnp.zeros((B,)), cond["cond_images"],
                        cond["static_latent"], cond["positions"])
    betas = get_named_beta_schedule("cosine", 1000)
    ns = NoiseScheduleVP.from_betas(betas)

    @jax.jit
    def sample(noise, params, cond):
        def raw_model(xx, tt, **kw):
            return model.apply(params, xx, tt, kw.get("cond_images"),
                               kw.get("static_latent"), kw.get("positions"),
                               cross_kv=kw.get("cross_kv"))

        c3 = {k: jnp.concatenate([v, v, v]) for k, v in cond.items()}
        kv = model.apply(params, jnp.zeros((3, 32, 512, 16)), jnp.zeros((3,)),
                         c3["cond_images"], c3["static_latent"],
                         c3["positions"], kv_only=True)
        fn = model_wrapper(raw_model, ns, model_type="v",
                           guidance_type="classifier-free", condition=cond,
                           unconditional_condition=cond, guidance_scale=2.0,
                           guidance_scale2=5.0, cross_kv=kv)
        return DPMSolver(fn, ns, algorithm_type="dpmsolver++").sample(
            noise, steps=32, order=2, method="multistep")

    @jax.jit
    def one_call(noise, params, cond):
        c3 = {k: jnp.concatenate([v, v, v]) for k, v in cond.items()}
        x3 = jnp.concatenate([noise] * 3)
        return model.apply(params, x3, jnp.full((3,), 500.0),
                           c3["cond_images"], c3["static_latent"],
                           c3["positions"])

    noise = jax.random.normal(ks[5], (B, T, N, C))
    return sample, one_call, noise, params, cond


def main():
    from gvfdiffusion_tpu.nn import attention as attn_mod

    print(f"devices: {jax.devices()}")

    sample, one_call, noise, params, cond = build()
    t = timeit(lambda: sample(noise, params, cond), iters=2, warmup=1)
    print(f"  full            {t*1e3:8.0f} ms ({t/32*1e3:.1f} ms/step)")

    t1 = timeit(lambda: one_call(noise, params, cond), iters=3, warmup=1)
    print(f"  single-call     {t1*1e3:8.1f} ms (x32 = {t1*32*1e3:.0f};"
          f" KV not cached here)")

    attn_mod._ATTN_IMPL = "xla"
    sample_x, *_ = build()
    tx = timeit(lambda: sample_x(noise, params, cond), iters=2, warmup=1)
    print(f"  xla-attn        {tx*1e3:8.0f} ms ({tx/32*1e3:.1f} ms/step)")
    attn_mod._ATTN_IMPL = "fused"

    sample_nt, _, noise2, params_nt, cond2 = build(no_temporal=True)
    tn = timeit(lambda: sample_nt(noise2, params_nt, cond2), iters=2, warmup=1)
    print(f"  no-temporal     {tn*1e3:8.0f} ms ({tn/32*1e3:.1f} ms/step)")

    sample_te, *_ = build(temporal_layout="einsum")
    te = timeit(lambda: sample_te(noise, params, cond), iters=2, warmup=1)
    print(f"  temporal-einsum {te*1e3:8.0f} ms ({te/32*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
