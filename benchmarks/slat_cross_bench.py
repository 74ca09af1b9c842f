"""SLat torso cross-sublayer: fused kernel vs composed XLA at bench shapes
(B=2 CFG batch, L=4096 compacted torso, C=1024, H=16, Lk=1370 DINOv2 cond).

Also verifies engagement: lowers one full SLat flow call and greps the HLO
for the fused kernel's custom_call.

Run: python benchmarks/slat_cross_bench.py
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
import numpy as np

from microbench import timeit

from gvfdiffusion_tpu.ops import fused_sublayer as fs

R = 8


def bench_one(name, label, call, args):
    @jax.jit
    def fn(x, *rest):
        def body(c, _):
            return call(c, *rest), None
        return jax.lax.scan(body, x, None, length=R)[0]

    try:
        t = timeit(lambda: fn(*args), iters=3) / R
        print(f"{name:28s} {label:18s} {t*1e3:7.2f} ms")
    except Exception as e:
        print(f"{name:28s} {label:18s} FAILED: {str(e)[:140]}")


def engagement_check():
    from gvfdiffusion_tpu.models.trellis.slat_flow import SLatFlowModel
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    L_VOX = 16384
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    lin = rng.choice(64 ** 3, size=L_VOX, replace=False)
    coords = np.stack([lin // 4096, (lin // 64) % 64, lin % 64], -1)
    structure = SparseVoxels(
        feats=jnp.zeros((2, L_VOX, 8)),
        coords=jnp.tile(jnp.asarray(coords[None], jnp.int32), (2, 1, 1)),
        valid=jnp.ones((2, L_VOX), bool),
        resolution=64,
    )
    model = SLatFlowModel(torso_capacity=4096, dtype=dtype)
    cond = jnp.asarray(rng.standard_normal((2, 1370, 1024)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), structure, jnp.zeros((2,)),
                        cond)
    lowered = jax.jit(
        lambda p, s, c: model.apply(p, s, jnp.full((2,), 0.5), c)
    ).lower(params, structure, cond)
    txt = lowered.as_text()
    n = txt.count("cross_sublayer")
    print(f"engagement: {n} fused cross_sublayer custom_calls in the "
          f"lowered SLat flow HLO (expect 24 torso blocks)")


def main():
    print(f"devices: {jax.devices()}")
    B, L, C, H, Lk = 2, 4096, 1024, 16, 1370
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x = jax.random.normal(ks[0], (B, L, C), jnp.bfloat16)
    p1 = (
        jnp.ones((C,), jnp.bfloat16),
        jnp.zeros((C,), jnp.bfloat16),
        jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.02,
        jnp.zeros((C,), jnp.bfloat16),
        jnp.ones((C,), jnp.bfloat16),
        jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.02,
        jnp.zeros((C,), jnp.bfloat16),
    )
    kv1 = (jax.random.normal(ks[3], (B, Lk, C), jnp.bfloat16),
           jax.random.normal(ks[4], (B, Lk, C), jnp.bfloat16))

    for lq, nbuf in ((128, 1), (256, 1), (512, 1), (1024, 1)):
        bench_one(
            "slat-cross B=2 L=4096", f"fused lq={lq} b={nbuf}",
            lambda x, lq=lq, nbuf=nbuf: fs.fused_cross_sublayer(
                x, p1, kv1, None, None, num_heads=H, rms=False,
                lq_block=lq, kv_buffers=nbuf), (x,))

    if os.environ.get("GVF_SLAT_BENCH_ENGAGE", "1") != "0":
        engagement_check()
    if os.environ.get("GVF_SLAT_BENCH_XLA", "") == "1":
        bench_one("slat-cross B=2 L=4096", "xla",
                  lambda x: fs.cross_sublayer_reference(
                      x, p1, kv1, None, None, num_heads=H, rms=False), (x,))


if __name__ == "__main__":
    main()
