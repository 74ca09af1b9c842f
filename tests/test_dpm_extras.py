"""Extended DPM-Solver paths: singlestep methods, order-3 adaptive, RF
decoder, mesh postprocess, checkpoint surgery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gvfdiffusion_tpu.diffusion import gaussian_diffusion as gd
from gvfdiffusion_tpu.diffusion.dpm_solver import DPMSolver, NoiseScheduleVP


@pytest.fixture(scope="module")
def ns():
    return NoiseScheduleVP.from_betas(gd.get_named_beta_schedule("linear", 1000))


def _oracle(ns, x0):
    def fn(x, t):
        t = jnp.broadcast_to(t, (x.shape[0],))
        a = ns.marginal_alpha(t).reshape(-1, *([1] * (x.ndim - 1)))
        s = ns.marginal_std(t).reshape(-1, *([1] * (x.ndim - 1)))
        return (x - a * x0) / s

    return fn


def _analytic(ns, x0, xT):
    aT = float(ns.marginal_alpha(jnp.float32(1.0)))
    sT = float(ns.marginal_std(jnp.float32(1.0)))
    t0 = 1.0 / ns.total_N
    a0 = float(ns.marginal_alpha(jnp.float32(t0)))
    s0 = float(ns.marginal_std(jnp.float32(t0)))
    c = (np.asarray(xT) - aT * np.asarray(x0)) / sT
    return a0 * np.asarray(x0) + s0 * c


@pytest.mark.parametrize("method,order", [
    ("singlestep_fixed", 2),
    ("singlestep_fixed", 3),
    ("singlestep", 2),
    ("singlestep", 3),
])
def test_singlestep_methods_recover_delta(ns, method, order):
    x0 = jnp.full((1, 8), 0.45)
    solver = DPMSolver(_oracle(ns, x0), ns)
    xT = jax.random.normal(jax.random.PRNGKey(0), (1, 8))
    out = solver.sample(xT, steps=18, order=order, method=method)
    np.testing.assert_allclose(np.asarray(out), _analytic(ns, x0, xT), atol=1e-2)


def test_adaptive_order3(ns):
    x0 = jnp.full((1, 8), -0.2)
    solver = DPMSolver(_oracle(ns, x0), ns)
    xT = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    out = solver.sample(xT, order=3, method="adaptive")
    np.testing.assert_allclose(np.asarray(out), _analytic(ns, x0, xT), atol=2e-2)


def test_order_allocation():
    solver = DPMSolver(lambda x, t: x, NoiseScheduleVP.from_betas(
        gd.get_named_beta_schedule("linear", 1000)))
    ts, orders = solver.get_orders_and_timesteps_for_singlestep_solver(
        9, 3, "time_uniform", 1.0, 1e-3
    )
    assert sum(orders) == 9
    assert len(ts) == len(orders) + 1
    ts, orders = solver.get_orders_and_timesteps_for_singlestep_solver(
        7, 2, "time_uniform", 1.0, 1e-3
    )
    assert sum(orders) == 7


def test_slat_rf_decoder():
    from gvfdiffusion_tpu.models.trellis.slat_rf_decoder import SLatRadianceFieldDecoder
    from gvfdiffusion_tpu.render.volume_renderer import render_volume
    from gvfdiffusion_tpu.representations.camera import Camera, fov_intrinsics, lookat_extrinsics
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    sv = from_lists(
        [np.array([[7, 7, 7], [8, 8, 8]])],
        [np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32)],
        resolution=16, capacity=4,
    )
    model = SLatRadianceFieldDecoder(
        resolution=16, model_channels=32, latent_channels=8, num_blocks=1,
        num_heads=4, window_size=4, rank=2, dim=4,
    )
    params = model.init(jax.random.PRNGKey(0), sv)
    strivec = model.apply(params, sv)
    assert strivec.trivec.shape == (4, 2, 3, 4)
    d = strivec.density_at(jnp.array([[0.47, 0.47, 0.47]]))
    assert np.isfinite(np.asarray(d)).all()


def test_mesh_postprocess():
    from gvfdiffusion_tpu.utils.mesh_postprocess import (
        boundary_edges, fill_holes_fan, simplify_vertex_clustering,
    )

    # open square pyramid (no base) -> 4 boundary edges forming one loop
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], [0.5, 0.5, 1.0]], np.float32
    )
    faces = np.array([[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]])
    be = boundary_edges(faces)
    assert len(be) == 4
    filled = fill_holes_fan(verts, faces)
    assert len(boundary_edges(filled)) == 0  # hole closed

    # simplification reduces vertex count
    rng = np.random.default_rng(0)
    v = rng.uniform(size=(200, 3)).astype(np.float32)
    f = rng.integers(0, 200, (300, 3))
    sv, sf = simplify_vertex_clustering(v, f, cell_size=0.25)
    assert len(sv) < 200


def test_static_vae_to_slat_decoder_surgery():
    from gvfdiffusion_tpu.models.trellis.slat_decoders import SLatGaussianDecoder
    from gvfdiffusion_tpu.utils.weight_convert import convert_static_vae_to_slat_decoder
    from gvfdiffusion_tpu.sparse.tensor import from_lists

    model = SLatGaussianDecoder(
        resolution=16, model_channels=32, latent_channels=4, num_blocks=2,
        num_heads=4, window_size=4,
    )
    sv = from_lists(
        [np.array([[1, 1, 1]])], [np.zeros((1, 4), np.float32)],
        resolution=16, capacity=4,
    )
    params = model.init(jax.random.PRNGKey(0), sv)

    # build a torch-style static-VAE state dict with matching shapes
    def flatten(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + (k,)))
            else:
                out[prefix + (k,)] = np.asarray(v)
        return out

    flat = flatten(params["params"])
    sd = {}
    for path, v in flat.items():
        if path[0] == "torso" and path[1] == "input_layer":
            t = "from_latent"
        elif path[0] == "torso" and path[1].startswith("blocks_"):
            i = path[1].split("_")[1]
            sub = path[2]
            if sub == "attn":
                t = f"decoder.{i}.attn.{path[3]}"
                if path[-1] == "kernel":
                    sd[f"{t}.weight"] = v.T
                else:
                    sd[f"{t}.bias"] = v
                continue
            t = f"decoder.{i}.mlp.mlp.{path[3][-1]}"
        elif path[0] == "out_layer":
            t = "out_layer"
        else:
            continue  # norms (non-affine) and pos embedder have no params
        if path[-1] == "kernel":
            sd[f"{t}.weight"] = v.T
        elif path[-1] == "bias":
            sd[f"{t}.bias"] = v

    converted = convert_static_vae_to_slat_decoder(sd, num_blocks=2)
    f_ref = flatten(params["params"])
    f_new = flatten(converted["params"])
    assert set(f_new).issubset(set(f_ref))
    for k in f_new:
        np.testing.assert_allclose(f_ref[k], f_new[k], atol=1e-6, err_msg=str(k))
