"""Benchmark: core video->4D denoise workload on the current device.

Times the dominant inference compute — a 32-step DPM-Solver++ multistep
denoise of the deformation latent with the full-size DiT (12x512, dual-scale
3-way CFG batch), the hot loop of inference_dpm_latent.py (reference
model/dpmsolver.py:1188-1230 + model/dit.py:449). The whole chain compiles to
one fused XLA graph via lax.scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = (10 s target from BASELINE.md) / measured — >1 means the core
denoise fits the end-to-end budget with headroom.
"""

import json
import os
import time

import jax

# persistent compilation cache: the axon-tunnel TPU compiles slowly, so the
# first bench run seeds this cache and later runs (e.g. the driver's) are fast
_CACHE = os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    from gvfdiffusion_tpu.diffusion.dpm_solver import (
        DPMSolver, NoiseScheduleVP, model_wrapper,
    )
    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import get_named_beta_schedule
    from gvfdiffusion_tpu.models.dit import DiT

    # full inference-size workload (configs/diffusion.yml:1-14; 32 frames,
    # DINOv2 token length 1370 = 1 cls + 37^2 patches for 518^2 input)
    B, T, N, C = 1, 32, 512, 16
    L, Ns = 1370, 512
    steps = 32

    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    model = DiT(
        resolution=N, in_channels=C, model_channels=512,
        static_cond_channels=14, image_cond_channels=1024, out_channels=C,
        num_blocks=12, num_heads=16, pe_mode="ape", qk_rms_norm=True,
        no_temporal_attn=False, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    x = jax.random.normal(ks[0], (B, T, N, C))
    cond = dict(
        cond_images=jax.random.normal(ks[1], (B, T, L, 1024), dtype),
        static_latent=jax.random.normal(ks[2], (B, Ns, 14)),
        positions=jax.random.uniform(ks[3], (B, N, 3)),
    )
    params = model.init(
        ks[4], x, jnp.zeros((B,)), cond["cond_images"], cond["static_latent"],
        cond["positions"],
    )

    betas = get_named_beta_schedule("cosine", 1000)
    ns = NoiseScheduleVP.from_betas(betas)

    # IMPORTANT: params/cond enter as jit ARGUMENTS, not closure captures —
    # captured arrays serialize as HLO constants (233 MB of weights), which
    # both bloats compile time and overflows the axon tunnel's request limit.
    @jax.jit
    def sample(noise, params, cond):
        def raw_model(xx, tt, cond_images=None, static_latent=None,
                      positions=None, cross_kv=None):
            return model.apply(
                params, xx, tt, cond_images, static_latent, positions,
                cross_kv=cross_kv,
            )

        # hoist the loop-invariant cross-attention KV out of the denoise loop:
        # build the 3-way CFG conditioning batch once and precompute per-block
        # K/V (~20% of per-step FLOPs saved)
        full_uncond = dict(cond, static_latent=jnp.zeros_like(cond["static_latent"]))
        c3 = {
            k: jnp.concatenate([full_uncond[k], cond[k], cond[k]])
            for k in cond
        }
        kv = model.apply(
            params, jnp.zeros((3 * B, T, N, C)), jnp.zeros((3 * B,)),
            c3["cond_images"], c3["static_latent"], c3["positions"],
            kv_only=True,
        )

        model_fn = model_wrapper(
            raw_model, ns, model_type="v", guidance_type="classifier-free",
            condition=cond, unconditional_condition=cond,
            guidance_scale=2.0, guidance_scale2=5.0, cross_kv=kv,
        )
        solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++")
        return solver.sample(noise, steps=steps, order=2, method="multistep")

    import sys

    noise = jax.random.normal(ks[5], (B, T, N, C))
    t_c0 = time.perf_counter()
    out = sample(noise, params, cond)  # compile + first run
    jax.block_until_ready(out)
    print(f"first call (compile+run): {time.perf_counter()-t_c0:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = sample(noise, params, cond)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"per-iter: {[round(t, 3) for t in times]}", file=sys.stderr)
    dt = min(times)

    print(json.dumps({
        "metric": "dpm32_denoise_latency_b1_cfg3",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / dt, 3),
    }))


if __name__ == "__main__":
    main()
