"""int8 QK / P.V quantized kernel timing vs bf16 at the DiT hot shapes
(VERDICT r3 item 4). Also reports the measured numeric drift on the same
inputs so the speed/parity trade is one table.

Run: python benchmarks/attn_quant_bench.py
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

from gvfdiffusion_tpu.ops import fused_attention as fa


def main():
    # B=32: the wild launch's single-pass batch (1 x 32 frames); H=16, D=32
    B, H, D = 32, 16, 32
    REPS = 20
    dt = jnp.bfloat16
    for name, lq, lk in [("spatial", 512, 512), ("img_cross", 512, 1370)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, lq, H, D), dt)
        k = jax.random.normal(ks[1], (B, lk, H, D), dt)
        v = jax.random.normal(ks[2], (B, lk, H, D), dt)

        outs = {}
        for quant in ("", "qk", "qk+av"):

            @jax.jit
            def fn(q, k, v, quant=quant):
                def body(x, _):
                    return fa.fused_attention(x, k, v, D**-0.5,
                                              quant=quant), None
                return jax.lax.scan(body, q, None, length=REPS)[0]

            t = timeit(lambda: fn(q, k, v), iters=5) / REPS
            flops = 4 * B * H * lq * lk * D

            @jax.jit
            def once(q, k, v, quant=quant):
                return fa.fused_attention(q, k, v, D**-0.5, quant=quant)

            outs[quant] = np.asarray(once(q, k, v), np.float32)
            drift = ""
            if quant:
                rel = (np.abs(outs[quant] - outs[""]).max()
                       / np.abs(outs[""]).max())
                drift = f"   rel_err={rel:.4f}"
            label = quant or "bf16"
            print(f"{name:10s} {label:6s} Lq={lq} Lk={lk}: {t*1e3:7.2f} ms  "
                  f"{flops/t/1e12:6.1f} TF/s{drift}")


if __name__ == "__main__":
    main()
