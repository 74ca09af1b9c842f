"""DiT per-component cost sheet via whole-program ablation deltas.

Each variant compiles ONE full-size 3-way-CFG model call (the denoise
step's body) with a component removed (nn/transformer.py `ablate`), and the
delta vs `full` attributes the cost. Single calls are ~260 ms — far above
the ~25-30 ms dispatch floor — and every timing syncs by fetching a reduced
scalar (the only trustworthy barrier on this backend).

Run: python benchmarks/dit_profile.py
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


def build(ablate=(), temporal_layout="einsum"):
    from gvfdiffusion_tpu.models.dit import DiT

    B, T, N, C = 1, 32, 512, 16
    L, Ns = 1370, 512
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    model = DiT(
        resolution=N, in_channels=C, model_channels=512,
        static_cond_channels=14, image_cond_channels=1024, out_channels=C,
        num_blocks=12, num_heads=16, pe_mode="ape", qk_rms_norm=True,
        temporal_layout=temporal_layout, ablate=tuple(ablate), dtype=dtype,
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

    @jax.jit
    def one_call(noise, params, cond):
        c3 = {k: jnp.concatenate([v, v, v]) for k, v in cond.items()}
        kv = model.apply(params, jnp.zeros((3, 32, 512, 16)), jnp.zeros((3,)),
                         c3["cond_images"], c3["static_latent"],
                         c3["positions"], kv_only=True)
        x3 = jnp.concatenate([noise, noise, noise])
        return model.apply(params, x3, jnp.full((3,), 500.0),
                           None, None, c3["positions"], cross_kv=kv)

    noise = jax.random.normal(ks[5], (B, T, N, C))
    return one_call, noise, params, cond


VARIANTS = [
    ("full", ()),
    ("no-spatial", ("spatial",)),
    ("no-temporal", ("temporal",)),
    ("temporal-proj-only", ("temporal_attn",)),
    ("no-img-cross", ("img_cross",)),
    ("no-static-cross", ("static_cross",)),
    ("no-mlp", ("mlp",)),
]


def main():
    results = {}
    for name, ab in VARIANTS:
        fn, noise, params, cond = build(ablate=ab)
        dt = timeit(lambda: fn(noise, params, cond), iters=5)
        results[name] = dt
    full = results["full"]
    print("\n=== component deltas (one 3B call; x32 for the denoise) ===")
    for name, dt in results.items():
        if name == "full":
            print(f"{name:22s} {dt*1e3:8.1f} ms")
        else:
            print(f"{name:22s} {dt*1e3:8.1f} ms  component ~ {(full-dt)*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
