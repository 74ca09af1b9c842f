"""Kernel micro-benchmarks.

Mirrors the reference's vox2seq/benchmark.py (CUDA-vs-PyTorch timing table at
resolutions 16-256) and extends it to every hot kernel: curves (native C++ vs
jnp), sparse attention modes, rasterizer backends, DiT block step. Run:

  python benchmarks/microbench.py [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

# persistent compile cache (axon tunnel compiles slowly; see docs/BENCH_NOTES.md)
import jax as _jax

os.makedirs(os.path.join(_ROOT, ".jax_cache"), exist_ok=True)
_jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    """Force completion AND a host round-trip. On the tunneled axon backend
    `jax.block_until_ready` can return before the computation ran (measured:
    16k-token attention "completing" in 0.1 ms); fetching a reduced scalar is
    the only trustworthy barrier. Reduce before fetching so transfer time
    (25 MB over the tunnel) doesn't pollute compute timings."""
    import jax

    leaves = [x.sum() for x in jax.tree.leaves(out) if hasattr(x, "sum")]
    jax.device_get(leaves)


def timeit(fn, iters=10, warmup=2):
    """Median of per-call wall times, each synced via a scalar fetch."""
    import statistics

    for _ in range(warmup):
        _sync(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def bench_curves():
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu import native
    from gvfdiffusion_tpu.ops import curves

    print("\n== curves: encode N random coords (ms) ==")
    print(f"{'N':>10} {'jnp-z':>10} {'native-z':>10} {'jnp-h':>10} {'native-h':>10}")
    for n in (4096, 65536, 262144):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 1024, (n, 3)).astype(np.int32)
        cj = jnp.asarray(coords)
        t_jz = timeit(lambda: curves.z_order_encode(cj[:, 0], cj[:, 1], cj[:, 2]))
        t_jh = timeit(lambda: curves.hilbert_encode(cj[:, 0], cj[:, 1], cj[:, 2]))
        t0 = time.perf_counter()
        for _ in range(10):
            native.z_order_encode(coords)
        t_nz = (time.perf_counter() - t0) / 10
        t0 = time.perf_counter()
        for _ in range(10):
            native.hilbert_encode(coords)
        t_nh = (time.perf_counter() - t0) / 10
        print(f"{n:>10} {t_jz*1e3:>10.3f} {t_nz*1e3:>10.3f} "
              f"{t_jh*1e3:>10.3f} {t_nh*1e3:>10.3f}")


def bench_attention():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.sparse import attention as sa
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    print("\n== sparse attention (ms, B=1 H=12 D=64) ==")
    print(f"{'L':>8} {'full':>10} {'windowed':>10} {'serialized':>12}")
    for l in (4096, 16384):
        res = 64
        rng = np.random.default_rng(0)
        lin = rng.choice(res**3, l, replace=False)
        coords = np.stack([lin // res**2, (lin // res) % res, lin % res], -1)
        x = SparseVoxels(
            feats=jnp.zeros((1, l, 768)),
            coords=jnp.asarray(coords[None], jnp.int32),
            valid=jnp.ones((1, l), bool),
            resolution=res,
        )
        q = jax.random.normal(jax.random.PRNGKey(0), (1, l, 12, 64))
        f_full = jax.jit(lambda q: sa.full_sparse_attention(q, q, q, x.valid, x.valid))
        f_win = jax.jit(
            lambda q: sa.windowed_sparse_attention(q, q, q, x, window_size=8)
        )
        f_ser = jax.jit(
            lambda q: sa.serialized_sparse_attention(q, q, q, x, window_tokens=512)
        )
        t_f = timeit(lambda: f_full(q), iters=3)
        t_w = timeit(lambda: f_win(q), iters=3)
        t_s = timeit(lambda: f_ser(q), iters=3)
        print(f"{l:>8} {t_f*1e3:>10.1f} {t_w*1e3:>10.1f} {t_s*1e3:>12.1f}")


def _random_scene(rng, n):
    """Low-occlusion translucent cloud (the original microbench scene)."""
    return np.concatenate(
        [
            rng.uniform(-0.3, 0.3, (n, 3)),
            rng.uniform(0.002, 0.01, (n, 3)),
            np.tile([1.0, 0, 0, 0], (n, 1)),
            rng.uniform(-1, 1, (n, 3)),
            rng.uniform(0.3, 0.9, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)


def _opaque_scene(rng, n):
    """Near-opaque spherical shell — tiles saturate within a few gaussians,
    the regime of a trained object (and of the multiround blend's
    transmittance early-exit)."""
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    xyz = d * rng.uniform(0.28, 0.32, (n, 1))
    return np.concatenate(
        [
            xyz,
            np.full((n, 3), 0.012),
            np.tile([1.0, 0, 0, 0], (n, 1)),
            rng.uniform(-1, 1, (n, 3)),
            np.full((n, 1), 0.97),
        ],
        axis=1,
    ).astype(np.float32)


def bench_rasterizer():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.representations.gaussians import from_activated

    print("\n== rasterizer 512^2 (ms/frame) ==")
    rng = np.random.default_rng(0)
    cam = orbit_camera(30.0, 20.0, radius=2.0, height=512, width=512)
    for scene, make in (("random", _random_scene), ("opaque", _opaque_scene)):
        for n in (16384, 65536):
            gs = from_activated(jnp.asarray(make(rng, n)))
            row = [f"{scene:>7} {n:>8}"]
            for label, kw in (
                ("1round", dict(rounds=1)),
                ("4round-ee", dict(rounds=4, early_exit=True)),
            ):
                try:
                    r = GaussianRenderer(RenderOptions(
                        near=0.1, far=10.0, use_mip=True, backend="binned",
                        max_per_tile=256, **kw,
                    ))
                    f = jax.jit(lambda: r.render(gs, cam)["render"])
                    t = timeit(f, iters=5)
                    row.append(f"{label}={t*1e3:.1f}ms ({1/t:.0f} fps)")
                except Exception as e:
                    row.append(f"{label}=ERR({type(e).__name__})")
            print(" ".join(row))


def bench_topk_error():
    """Quantify the top-K binning approximation on a dense opaque scene
    (the VAE training regime): PSNR of max_per_tile=K renders against a
    K=4096 reference at 131k gaussians."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.representations.gaussians import from_activated

    print("\n== top-K binning error, 131k-gaussian opaque scene @512^2 ==")
    rng = np.random.default_rng(0)
    n = 131072
    gs = from_activated(jnp.asarray(_opaque_scene(rng, n)))
    cam = orbit_camera(30.0, 20.0, radius=2.0, height=512, width=512)

    def render_k(k):
        r = GaussianRenderer(RenderOptions(
            near=0.1, far=10.0, use_mip=True, backend="binned",
            max_per_tile=k, bg_color=(1.0, 1.0, 1.0),
        ))
        return np.asarray(jax.jit(lambda: r.render(gs, cam)["render"])())

    ref = render_k(4096)
    for k in (64, 256, 1024):
        img = render_k(k)
        mse = float(np.mean((img - ref) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"  K={k:>5}: PSNR vs K=4096 = {psnr:.1f} dB")


def bench_octree():
    import jax
    import jax.numpy as jnp

    from gvfdiffusion_tpu.render.octree_renderer import (OctreeRenderer,
                                                         OctreeRenderOptions)
    from gvfdiffusion_tpu.representations.camera import orbit_camera
    from gvfdiffusion_tpu.representations.octree import (Strivec, VoxelOctree,
                                                         from_sparse_voxels)
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    print("\n== octree renderers 256^2 (ms/frame, 16k leaves @64^3) ==")
    l, res = 16384, 64
    rng = np.random.default_rng(0)
    lin = rng.choice(res**3, l, replace=False)
    coords = np.stack([lin // res**2, (lin // res) % res, lin % res], -1)
    sv = SparseVoxels(
        feats=jnp.zeros((1, l, 1)), coords=jnp.asarray(coords[None], jnp.int32),
        valid=jnp.ones((1, l), bool), resolution=res,
    )
    tree = from_sparse_voxels(sv)
    cam = orbit_camera(30.0, 20.0, radius=1.6, height=256, width=256,
                       target=(0.5, 0.5, 0.5))
    r = OctreeRenderer(OctreeRenderOptions(num_steps=128))

    vox = VoxelOctree(tree=tree, density=jnp.full((l,), 4.0),
                      colors_dc=jnp.zeros((l, 3)))
    f = jax.jit(lambda: r.render(vox, cam)["color"])
    print(f"  voxel   {timeit(f, iters=3)*1e3:8.1f} ms")

    tv = Strivec(
        tree=tree,
        trivec=jnp.asarray(rng.uniform(0.5, 1.5, (l, 8, 3, 8)), jnp.float32),
        density=jnp.full((l, 8), 1.0),
        colors=jnp.asarray(rng.uniform(0, 1, (l, 8, 3)), jnp.float32),
    )
    f = jax.jit(lambda: r.render(tv, cam)["color"])
    print(f"  trivec  {timeit(f, iters=3)*1e3:8.1f} ms")


def bench_static_vae():
    """BASELINE config #3: static VAE encode->decode forward latency."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gvfdiffusion_tpu.models.static_vae import SparseTransformerVAE
    from gvfdiffusion_tpu.sparse.tensor import SparseVoxels

    print("\n== static VAE roundtrip (full size: 12 blocks x 768ch, swin 8) ==")
    model = SparseTransformerVAE()
    for l in (16384,):
        res = 64
        rng = np.random.default_rng(0)
        lin = rng.choice(res**3, l, replace=False)
        coords = np.stack([lin // res**2, (lin // res) % res, lin % res], -1)
        x = SparseVoxels(
            feats=jnp.asarray(rng.normal(size=(1, l, 1024)).astype(np.float32)),
            coords=jnp.asarray(coords[None], jnp.int32),
            valid=jnp.ones((1, l), bool),
            resolution=res,
        )
        k = jax.random.PRNGKey(0)
        params = model.init(k, x, k)

        @jax.jit
        def roundtrip(params, x):
            out, mean, logvar = model.apply(params, x, jax.random.PRNGKey(1))
            return out.feats

        t = timeit(lambda: roundtrip(params, x), iters=3, warmup=1)
        print(f"{l:>8} voxels: {t*1e3:.0f} ms")


def bench_dit_step():
    import jax
    import jax.numpy as jnp

    from gvfdiffusion_tpu.diffusion.gaussian_diffusion import create_diffusion
    from gvfdiffusion_tpu.models.dit import DiT
    from gvfdiffusion_tpu.train.diffusion_trainer import make_train_step
    from gvfdiffusion_tpu.train.train_state import create_train_state, make_optimizer

    print("\n== DiT train step (full size, batch 2) ==")
    # full remat: without it the fwd+bwd graph exceeds single-chip HBM and
    # the remote compiler crashes (the elastic controller would pick this)
    model = DiT(remat_blocks=12)
    B, T, N, L = 2, 24, 512, 1370
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    batch = dict(
        latent=jax.random.normal(ks[0], (B, T, N, 16)),
        cond_images=jax.random.normal(ks[1], (B, T, L, 1024)),
        static_latent=jax.random.normal(ks[2], (B, N, 14)),
        positions=jax.random.uniform(ks[3], (B, N, 3)),
    )
    params = model.init(
        ks[4], batch["latent"], jnp.zeros((B,)), batch["cond_images"],
        batch["static_latent"], batch["positions"],
    )
    diffusion = create_diffusion()
    tx = make_optimizer()
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model.apply, diffusion, tx))
    t = timeit(lambda: step(state, batch, ks[5])[1]["loss"], iters=3, warmup=1)
    print(f"batch {B} x {T} frames: {t*1e3:.0f} ms/step")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--only", default=None,
                   choices=[None, "curves", "attention", "rasterizer",
                            "topk_error", "octree", "static_vae", "dit"])
    args = p.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print(f"devices: {jax.devices()}")
    if args.only in (None, "curves"):
        bench_curves()
    if args.only in (None, "attention"):
        bench_attention()
    if args.only in (None, "rasterizer"):
        bench_rasterizer()
    if args.only == "topk_error":
        bench_topk_error()
    if args.only == "octree":
        bench_octree()
    if args.only in (None, "static_vae"):
        bench_static_vae()
    if args.only in (None, "dit"):
        bench_dit_step()
