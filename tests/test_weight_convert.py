"""Weight converter tests: synthetic torch-style state dicts with the
reference's naming produce flax trees that exactly match model.init structure
and give identical forward results through transposed weights."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.models.dit import DiT
from gvfdiffusion_tpu.models.motion_vae import MotionVAE, pad_static_gs
from gvfdiffusion_tpu.utils import weight_convert as wc


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def make_torch_dit_sd(flax_params, num_blocks, no_temporal_attn=False):
    """Reverse-map flax params into a reference-named torch state dict."""
    flat = flatten(flax_params["params"])
    sd = {}
    for path, val in flat.items():
        name = list(path)
        v = np.asarray(val)
        # flax kernel -> torch weight (transposed)
        is_kernel = name[-1] == "kernel"
        torch_val = v.T if is_kernel else v
        suffix = "weight" if is_kernel else ("bias" if name[-1] == "bias" else name[-1])
        mod = name[:-1]
        tname = None
        if mod == ["input_layer"]:
            tname = "input_layer"
        elif mod[:1] == ["t_embedder"]:
            tname = f"t_embedder.mlp.{mod[1][-1]}"
        elif mod == ["image_cond_proj"]:
            tname = "image_cond_proj"
        elif mod == ["static_cond_proj"]:
            tname = "static_cond_proj"
        elif mod[:1] == ["final_layer"]:
            sub = mod[1]
            if sub == "adaLN_modulation":
                tname = "final_layer.adaLN_modulation.1"
            elif sub == "linear":
                tname = "final_layer.linear"
            else:
                continue  # norm_final non-affine
        elif mod and mod[0].startswith("blocks_"):
            i = mod[0].split("_")[1]
            sub = mod[1]
            if sub == "adaLN_modulation":
                tname = f"blocks.{i}.adaLN_modulation.1"
            elif sub == "adaLN_modulation_temporal":
                tname = f"blocks.{i}.adaLN_modulation_temporal.1"
            elif sub in ("norm3", "norm4"):
                # LayerNorm scale/bias
                suffix = "weight" if name[-1] == "scale" else "bias"
                tname = f"blocks.{i}.{sub}"
                torch_val = v
            elif sub == "mlp":
                tname = f"blocks.{i}.mlp.mlp.{mod[2][-1]}"
            elif sub.endswith("attn"):
                inner = mod[2]
                if inner in ("q_rms_norm", "k_rms_norm"):
                    sd[f"blocks.{i}.{sub}.{inner}.gamma"] = v
                    continue
                tname = f"blocks.{i}.{sub}.{inner}"
        elif mod == [] and name[-1] == "pos_emb":
            sd["pos_embedder"] = v
            continue
        if tname is None:
            raise AssertionError(f"unmapped flax param {path}")
        sd[f"{tname}.{suffix}"] = torch_val
    return sd


def test_dit_roundtrip_conversion():
    model = DiT(
        resolution=8, in_channels=4, model_channels=32,
        static_cond_channels=14, image_cond_channels=16, out_channels=4,
        num_blocks=2, num_heads=4, pe_mode="ape", qk_rms_norm=True,
        no_temporal_attn=False,
    )
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    inputs = dict(
        x=jax.random.normal(ks[0], (1, 2, 8, 4)),
        t=jnp.array([5.0]),
        cond_images=jax.random.normal(ks[1], (1, 2, 3, 16)),
        static_latent=jax.random.normal(ks[2], (1, 6, 14)),
        positions=jax.random.uniform(ks[3], (1, 8, 3)),
    )
    params = model.init(ks[4], **inputs)
    # randomize so outputs aren't trivially zero
    params = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.05, params
    )
    sd = make_torch_dit_sd(params, num_blocks=2)
    converted = wc.convert_dit(sd, num_blocks=2, qk_rms_norm=True)

    # structural equality
    f_ref = flatten(jax.tree.map(np.asarray, params)["params"])
    f_new = flatten(converted["params"])
    assert set(f_ref.keys()) == set(f_new.keys())
    for k in f_ref:
        np.testing.assert_allclose(f_ref[k], f_new[k], atol=1e-6, err_msg=str(k))

    # forward equality
    out_ref = model.apply(params, **inputs)
    out_new = model.apply(
        jax.tree.map(jnp.asarray, converted), **inputs
    )
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_new), atol=1e-5)


def test_strip_prefix():
    sd = {"module.a.weight": 1, "b.bias": 2}
    out = wc.strip_prefix(sd)
    assert set(out) == {"a.weight", "b.bias"}


def test_motion_vae_converter_structure():
    model = MotionVAE(
        depth=2, dim=48, queries_dim=48, output_dim=14, num_inputs=32,
        num_latents=8, latent_dim=4, heads=4, knn_k=4,
    )
    rng = jax.random.PRNGKey(0)
    gs_list = [np.random.default_rng(0).normal(size=(16, 14)).astype(np.float32)]
    static_gs, valid = pad_static_gs(gs_list)
    inputs = dict(
        static_gs=static_gs, gs_valid=valid,
        static_pc=jax.random.normal(rng, (1, 32, 3)),
        delta_pc=jax.random.normal(rng, (1, 2, 32, 3)),
        rng=rng,
    )
    params = model.init(rng, **inputs)
    flat = flatten(jax.tree.map(np.asarray, params)["params"])

    # build reference-named sd by reverse mapping
    sd = {}
    ref_names = {
        "input_embedding": "input_embedding.0",
        "gs_embedding": "gs_embedding.0",
        "enc_cross": "cross_attend_blocks.0.fn",
        "enc_ff": "cross_attend_blocks.1.fn",
        "mean_fc": "mean_fc",
        "logvar_fc": "logvar_fc",
        "proj": "proj",
        "dec_cross": "decoder_cross_attn.fn",
        "to_outputs": "to_outputs",
    }
    for i in range(2):
        ref_names[f"latent_attn_{i}"] = f"layers.{i}.0.fn"
        ref_names[f"latent_ff_{i}"] = f"layers.{i}.1.fn"
    for path, v in flat.items():
        head = path[0]
        tbase = ref_names[head]
        rest = path[1:-1]
        leaf = path[-1]
        sub = ".".join(
            r.replace("net_", "net.") if r.startswith("net_") else r for r in rest
        )
        tname = tbase + ("." + sub if sub else "")
        suffix = "weight" if leaf == "kernel" else "bias"
        sd[f"{tname}.{suffix}"] = v.T if leaf == "kernel" else v

    converted = wc.convert_motion_vae(sd, depth=2)
    f_new = flatten(converted["params"])
    assert set(flat.keys()) == set(f_new.keys())
    for k in flat:
        np.testing.assert_allclose(flat[k], f_new[k], atol=1e-6, err_msg=str(k))
