"""Model registry + from_pretrained loading.

Re-design of trellis/models/__init__.py:32-106 (name -> class dispatch,
safetensors loading, and the GVF static-VAE -> SLatGaussianDecoder checkpoint
surgery :46-76) and trellis/pipelines/base.py:7-66 (pipeline.json + per-model
checkpoint directory layout).

A "pretrained" directory here is:
    <root>/pipeline.json            {"name": ..., "models": {key: relpath}}
    <root>/<model>.json             constructor name + kwargs
    <root>/<model>.npz | .safetensors | .pt   weights

Torch checkpoints run through utils/weight_convert; npz checkpoints are
already flax-tree flat dicts ('a/b/c' keys).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

MODEL_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def _populate():
    from .dit import DiT
    from .dinov2 import DinoV2
    from .motion_vae import MotionVAE
    from .static_vae import SparseTransformerVAE
    from .trellis.slat_decoders import SLatEncoder, SLatGaussianDecoder
    from .trellis.slat_flow import SLatFlowModel
    from .trellis.slat_mesh_decoder import SLatMeshDecoder, SLatMeshDecoderRef
    from .trellis.slat_rf_decoder import SLatRadianceFieldDecoder
    from .trellis.ss_flow import SparseStructureFlowModel
    from .trellis.ss_vae import SparseStructureDecoder, SparseStructureEncoder

    MODEL_REGISTRY.update({
        "DiT": DiT,
        "GSKLTemporalVariationalAutoEncoder": MotionVAE,  # reference name
        "MotionVAE": MotionVAE,
        "SparseTransformerVAE": SparseTransformerVAE,
        "SparseStructureEncoder": SparseStructureEncoder,
        "SparseStructureDecoder": SparseStructureDecoder,
        "SparseStructureFlowModel": SparseStructureFlowModel,
        "SLatFlowModel": SLatFlowModel,
        "SLatEncoder": SLatEncoder,
        "SLatGaussianDecoder": SLatGaussianDecoder,
        "ElasticSLatGaussianDecoder": SLatGaussianDecoder,  # reference alias
        "SLatRadianceFieldDecoder": SLatRadianceFieldDecoder,
        # reference name -> the checkpoint-compatible variant; the TPU
        # re-design stays importable as TpuSLatMeshDecoder
        "SLatMeshDecoder": SLatMeshDecoderRef,
        "ElasticSLatMeshDecoder": SLatMeshDecoderRef,
        "TpuSLatMeshDecoder": SLatMeshDecoder,
        "DinoV2": DinoV2,
    })


def _adapt_kwargs(name: str, kwargs: Dict) -> Dict:
    """Translate reference-style constructor args (the TRELLIS release json
    configs, trellis/models/__init__.py from_pretrained) onto the flax
    classes: torch-runtime flags are dropped, num_head_channels becomes
    num_heads, representation_config dicts map to our flat fields."""
    kw = dict(kwargs)
    kw.pop("use_fp16", None)
    kw.pop("use_checkpoint", None)
    kw.pop("use_skip_connection", None)  # slat-flow: ours is always on (ref default)
    if "num_head_channels" in kw:
        nhc = kw.pop("num_head_channels")
        if kw.get("num_heads") is None and kw.get("model_channels") and nhc:
            kw["num_heads"] = kw["model_channels"] // nhc
    rep = kw.pop("representation_config", None)
    if isinstance(rep, dict):
        if name in ("SLatMeshDecoder", "ElasticSLatMeshDecoder"):
            kw["use_color"] = rep.get("use_color", False)
        elif "GaussianDecoder" in name:
            from .sparse_vae import GSConfig

            kw["rep_config"] = GSConfig(
                num_gaussians=rep.get("num_gaussians", 8),
                voxel_size=rep.get("voxel_size", 1.5),
                scaling_bias=rep.get("scaling_bias", 0.004),
                opacity_bias=rep.get("opacity_bias", 0.1),
                scaling_activation=rep.get("scaling_activation", "softplus"),
                filter_3d_kernel_size=rep.get("3d_filter_kernel_size", 9e-4),
                lr_rotation=(rep.get("lr") or {}).get("_rotation", 1.0),
            )
        # RF decoder: rank/dim already match our field names
        elif "RadianceField" in name:
            kw["rank"] = rep.get("rank", 16)
            kw["dim"] = rep.get("dim", 8)
    return kw


def create_model(name: str, **kwargs):
    if not MODEL_REGISTRY:
        _populate()
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**_adapt_kwargs(name, kwargs))


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params_npz(params: Dict, path: str) -> None:
    np.savez(path, **flatten_tree(params))


def load_params(path: str, converter: Optional[Callable] = None) -> Dict:
    """Load weights from .npz (flax-flat), .safetensors or .pt (torch —
    requires a converter from utils/weight_convert)."""
    if path.endswith(".npz"):
        data = np.load(path)
        return _unflatten({k: data[k] for k in data.files})
    from ..utils.weight_convert import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    if converter is None:
        raise ValueError(f"torch checkpoint {path} needs an explicit converter")
    return converter(sd)


_CONVERTERS: Dict[str, Callable] = {}


def _converters():
    if not _CONVERTERS:
        from ..utils import weight_convert as wc

        _CONVERTERS.update({
            "DiT": wc.convert_dit,
            "MotionVAE": wc.convert_motion_vae,
            "GSKLTemporalVariationalAutoEncoder": wc.convert_motion_vae,
            "SparseTransformerVAE": wc.convert_static_vae,
        })
    return _CONVERTERS


def from_pretrained(root: str, key: str) -> Tuple[Any, Dict]:
    """Load (model, params) from a pretrained directory (see module doc)."""
    with open(os.path.join(root, f"{key}.json")) as f:
        spec = json.load(f)
    model = create_model(spec["name"], **spec.get("args", {}))
    weights = spec.get("weights", f"{key}.npz")
    params = load_params(
        os.path.join(root, weights), _converters().get(spec["name"])
    )
    return model, params


def load_pipeline_spec(root: str) -> Dict:
    with open(os.path.join(root, "pipeline.json")) as f:
        return json.load(f)
