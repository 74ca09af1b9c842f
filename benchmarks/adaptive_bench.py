"""Bench the ADAPTIVE DPM-Solver++ on the chip (VERDICT r3 item 3).

The reference's shipped in-the-wild launch uses `--adaptive`
(/root/reference/README.md:22, scripts/run_in_the_wild.sh:39 ->
model/dpmsolver.py:973-1027: order 2, atol 0.0078, rtol 0.05, theta 0.9);
BENCH_r03 timed only the 32-step multistep scan. This measures
`_sample_adaptive` (a lax.while_loop) at full DiT size on the same workload
and reports NFE + latency vs the multistep number.

Run: python benchmarks/adaptive_bench.py          (on the tunneled chip)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets up the compile cache)


def main():
    results = {}

    sample_a, noise, params, cond = bench.build_denoise(method="adaptive")
    dt_a = bench._time_stage("dpm_denoise_adaptive", sample_a, noise, params,
                             cond, iters=3)
    x, info = sample_a(noise, params, cond)
    import numpy as np

    nfe = int(np.asarray(info["nfe"]))
    iters = int(np.asarray(info["iters"]))
    results["adaptive"] = {"latency_s": round(dt_a, 4), "nfe": nfe,
                           "iters": iters,
                           "ms_per_nfe": round(dt_a / max(nfe, 1) * 1e3, 1)}
    del sample_a
    import jax

    jax.clear_caches()

    sample_m, noise, params, cond = bench.build_denoise(method="multistep")
    dt_m = bench._time_stage("dpm_denoise_multistep32", sample_m, noise,
                             params, cond, iters=3)
    results["multistep32"] = {"latency_s": round(dt_m, 4), "nfe": 32,
                              "ms_per_nfe": round(dt_m / 32 * 1e3, 1)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
