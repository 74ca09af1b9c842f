"""Release-artifact resolution + file-level checkpoint loading.

Mirrors the reference's HF-Hub release layout exactly
(reference utils/inference_utils.py:21-34 MODEL_REPOS and :384-445
download_model_files; parse + "module." prefix strip at
inference_dpm_latent.py:79-115; mean/std tensors at :150-153) so that a user
can point this framework at the same downloaded files — and so the whole
file-level path (resolve -> torch/safetensors parse -> prefix strip ->
convert -> flax params) is exercisable offline against locally fabricated
files in the identical layout (tests/test_dress_rehearsal.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# the reference release map, verbatim (utils/inference_utils.py:21-34)
MODEL_REPOS = {
    "GVFDiffusion_v1.0": {
        "repo_id": "BwZhang/GaussianVariationFieldDiffusion",
        "revision": "main",
        "model_path": "ema_diffusion_0.9999_500000.pt",
        "vae_path": "ema_deformation_0.9999_200000.pt",
        "static_vae_path": "ema_static_vae_0.9999_200000.pt",
        "static_mean_path": "static_mean.pt",
        "static_std_path": "static_std.pt",
        "deformation_mean_path": "deformation_mean.pt",
        "deformation_std_path": "deformation_std.pt",
        "assets_dir": "assets",
    }
}

_FILE_KEYS = {
    "ckpt": "model_path",
    "vae_ckpt": "vae_path",
    "static_vae_ckpt": "static_vae_path",
    "static_mean": "static_mean_path",
    "static_std": "static_std_path",
    "deformation_mean": "deformation_mean_path",
    "deformation_std": "deformation_std_path",
}


def download_model_files(model_name: str,
                         local_hub: Optional[str] = None) -> Dict[str, str]:
    """Resolve the release's seven files to local paths.

    local_hub (or env GVF_HUB_DIR): a directory laid out as
    <local_hub>/<repo_id>/<filename> — the offline mirror of the hub repo
    (zero-egress environments; also how the dress rehearsal fabricates a
    release). Otherwise falls back to huggingface_hub downloads (the
    reference's behavior, utils/inference_utils.py:384-445)."""
    if model_name not in MODEL_REPOS:
        raise ValueError(
            f"Unknown model name: {model_name}. "
            f"Available models: {list(MODEL_REPOS)}")
    info = MODEL_REPOS[model_name]
    local_hub = local_hub or os.environ.get("GVF_HUB_DIR")
    out: Dict[str, str] = {}
    if local_hub:
        repo_dir = os.path.join(local_hub, info["repo_id"])
        for key, pkey in _FILE_KEYS.items():
            path = os.path.join(repo_dir, info[pkey])
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"offline hub mirror {repo_dir!r} is missing "
                    f"{info[pkey]!r} (for {key})")
            out[key] = path
        return out
    from huggingface_hub import hf_hub_download  # network path

    for key, pkey in _FILE_KEYS.items():
        out[key] = hf_hub_download(repo_id=info["repo_id"],
                                   filename=info[pkey],
                                   revision=info["revision"])
    return out


def load_stat_tensor(path: str) -> np.ndarray:
    """mean/std files are bare torch tensors (reference
    inference_dpm_latent.py:150-153)."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t.to(torch.float32).numpy())


def load_gvf_release(files: Dict[str, str], *, dit_kwargs: Dict,
                     vae_kwargs: Dict, static_vae_kwargs: Dict) -> Dict:
    """File-level load of the GVF release: parse each .pt state dict, strip
    the DDP "module." prefix (reference inference_dpm_latent.py:79-115),
    convert to flax trees, and load the latent-normalization stats.

    *_kwargs carry the converter's structural arguments (num_blocks/depth
    etc. — the reference hard-codes these in its launch script's config)."""
    from . import weight_convert as wc

    dit_sd = wc.strip_prefix(wc.load_torch_checkpoint(files["ckpt"]))
    vae_sd = wc.strip_prefix(wc.load_torch_checkpoint(files["vae_ckpt"]))
    svae_sd = wc.strip_prefix(
        wc.load_torch_checkpoint(files["static_vae_ckpt"]))
    return {
        "dit": wc.convert_dit(dit_sd, **dit_kwargs),
        "motion_vae": wc.convert_motion_vae(vae_sd, **vae_kwargs),
        "static_vae": wc.convert_static_vae(svae_sd, **static_vae_kwargs),
        "static_mean": load_stat_tensor(files["static_mean"]),
        "static_std": load_stat_tensor(files["static_std"]),
        "deformation_mean": load_stat_tensor(files["deformation_mean"]),
        "deformation_std": load_stat_tensor(files["deformation_std"]),
    }
