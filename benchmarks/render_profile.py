"""Per-piece cost of the binned rasterizer at the bench shape (131k
gaussians, 512^2, tile 32, K=256): projection, intersection matrix, per-tile
top_k, gather, blend. 8-frame scans per timing (amortize dispatch).

Run: python benchmarks/render_profile.py
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

from gvfdiffusion_tpu.ops.rasterize import binning
from gvfdiffusion_tpu.ops.rasterize.xla_blend import blend_tiles
from gvfdiffusion_tpu.render import reference_renderer as rr
from gvfdiffusion_tpu.render.renderer import GaussianRenderer, RenderOptions
from gvfdiffusion_tpu.representations.camera import Camera, orbit_camera
from gvfdiffusion_tpu.representations.gaussians import GaussianSplat

N = 131072
H = W = 512
TILE, K = 32, 256
REPS = 8


def main():
    rng = np.random.default_rng(0)
    aabb = jnp.asarray([-0.5, -0.5, -0.5, 1.0, 1.0, 1.0], jnp.float32)
    gs = GaussianSplat(
        _xyz=jnp.asarray(rng.random((N, 3)), jnp.float32),
        _features_dc=jnp.asarray(rng.random((N, 1, 3)), jnp.float32),
        _scaling=jnp.full((N, 3), -5.5, jnp.float32),
        _rotation=jnp.zeros((N, 4), jnp.float32),
        _opacity=jnp.zeros((N, 1), jnp.float32),
        aabb=aabb,
    )
    cam = orbit_camera(0.3, 0.0, height=H, width=W)
    opt = RenderOptions(near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0),
                        use_mip=True, backend="binned", max_per_tile=K)
    renderer = GaussianRenderer(opt)
    xyz, scaling, rotation, colors, opac = renderer._activate(
        gs, None, False, None)
    bg = jnp.asarray(opt.bg_color, jnp.float32)

    def scan(fn, *args):
        @jax.jit
        def run(*args):
            def body(c, _):
                out = fn(*args)
                leaves = [x for x in jax.tree.leaves(out)
                          if hasattr(x, "dtype") and x.dtype != bool]
                s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return c + s, None
            return jax.lax.scan(body, 0.0, None, length=REPS)[0]
        return timeit(lambda: run(*args), iters=4) / REPS

    # 1. projection
    t = scan(lambda: rr.project_gaussians(
        xyz, scaling, rotation, cam, kernel_size_2d=0.1, mip=True))
    print(f"project          {t*1e3:7.2f} ms", flush=True)

    proj = jax.jit(lambda: rr.project_gaussians(
        xyz, scaling, rotation, cam, kernel_size_2d=0.1, mip=True))()
    mean2d, cov2d, depths = proj["mean2d"], proj["cov2d"], proj["depth"]
    op = opac * proj["compensation"]
    valid = proj["in_front"]

    # 2. intersection matrix
    t = scan(lambda: binning.intersect_tiles(
        mean2d, cov2d, op, valid, H, W, TILE)[0])
    print(f"intersect        {t*1e3:7.2f} ms", flush=True)

    inter, conic, n_ty, n_tx = jax.jit(
        lambda: binning.intersect_tiles(mean2d, cov2d, op, valid, H, W, TILE)
    )()

    # 3. per-tile top_k
    cursor_d = jnp.full((inter.shape[0],), -jnp.inf)
    cursor_i = jnp.full((inter.shape[0],), -1)
    t = scan(lambda: binning.select_front(inter, depths, cursor_d, cursor_i, K)[:2])
    print(f"topk             {t*1e3:7.2f} ms", flush=True)

    # 3b. binning internals: depth argsort / attribute gathers / rank index
    #     build / rank select / final takes
    t = scan(lambda: binning.depth_rank_order(depths, valid))
    print(f"  sort           {t*1e3:7.2f} ms", flush=True)
    order = jax.jit(lambda: binning.depth_rank_order(depths, valid))()
    t = scan(lambda: [a[order] for a in (mean2d, cov2d, colors, op, depths)])
    print(f"  attr_gather    {t*1e3:7.2f} ms", flush=True)
    t = scan(lambda: binning.build_rank_index(inter))
    print(f"  rank_build     {t*1e3:7.2f} ms", flush=True)
    ri = jax.jit(lambda: binning.build_rank_index(inter))()
    ri = ri._replace(n=int(inter.shape[1]))
    lo = jnp.zeros((inter.shape[0],), jnp.int32)
    t = scan(lambda: binning.rank_select(ri, lo, K))
    print(f"  rank_select    {t*1e3:7.2f} ms", flush=True)
    idx = jax.jit(lambda: binning.rank_select(ri, lo, K)[0])()
    t = scan(lambda: [jnp.take(a, idx, axis=0)
                      for a in (mean2d, conic, colors, op, depths)])
    print(f"  bin_take       {t*1e3:7.2f} ms", flush=True)

    # 4. full bin (incl. gathers)
    t = scan(lambda: binning.bin_gaussians(
        mean2d, cov2d, colors, op, depths, valid, H, W, TILE, K))
    print(f"bin_total        {t*1e3:7.2f} ms", flush=True)

    binned = jax.jit(lambda: binning.bin_gaussians(
        mean2d, cov2d, colors, op, depths, valid, H, W, TILE, K))()
    # jit returns every pytree leaf as an array; restore the static fields
    binned = binned._replace(
        n_tiles_y=int(binned.n_tiles_y), n_tiles_x=int(binned.n_tiles_x),
        tile=int(binned.tile))

    # 5. blend
    t = scan(lambda: blend_tiles(binned, H, W, bg))
    print(f"blend            {t*1e3:7.2f} ms", flush=True)

    # 6. whole render
    t = scan(lambda: renderer.render(gs, cam)["render"])
    print(f"render_total     {t*1e3:7.2f} ms", flush=True)

    # 7. adaptive multiround (early-exit while_loop): same K_eff = 256 as the
    #    single-round path but per_round slices of 64 — saturated tiles stop
    #    after T < 1e-4, so dense scenes blend far fewer than 256/px
    for pr, rd in ((64, 4), (128, 2)):
        r_ee = GaussianRenderer(RenderOptions(
            near=0.1, far=10.0, bg_color=(1.0, 1.0, 1.0), use_mip=True,
            backend="binned", max_per_tile=pr, rounds=rd, early_exit=True))
        t = scan(lambda r=r_ee: r.render(gs, cam)["render"])
        print(f"render_ee_{pr}x{rd} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
