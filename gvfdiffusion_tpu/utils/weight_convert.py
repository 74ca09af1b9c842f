"""Torch-checkpoint -> flax-params conversion.

Maps the reference's released torch state dicts (HF checkpoint names at
utils/inference_utils.py:21-34: ema_diffusion_*.pt, ema_deformation_*.pt,
ema_static_vae_*.pt; TRELLIS safetensors via trellis/models/__init__.py:78-97)
onto this framework's flax parameter trees.

Conventions:
  torch Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
  torch LayerNorm weight/bias    -> flax scale/bias
  torch Conv3d weight [o,i,k,k,k]-> flax Conv kernel [k,k,k,i,o]
Name maps are per-model tables of (torch prefix regex -> flax path); the
GVF->TRELLIS checkpoint surgery (`decoder.->blocks.`,
`from_latent.->input_layer.`, reference trellis/models/__init__.py:46-76)
is just another table entry.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def _t(w):
    return np.asarray(w).T


def _conv3d(w):
    # [o, i, k, k, k] -> [k, k, k, i, o]
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def _conv2d(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def set_in(tree: Dict, path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(sd, torch_name, tree, flax_path):
    set_in(tree, flax_path + ["kernel"], _t(sd[f"{torch_name}.weight"]))
    if f"{torch_name}.bias" in sd:
        set_in(tree, flax_path + ["bias"], np.asarray(sd[f"{torch_name}.bias"]))


def _layernorm(sd, torch_name, tree, flax_path):
    if f"{torch_name}.weight" in sd:
        set_in(tree, flax_path + ["scale"], np.asarray(sd[f"{torch_name}.weight"]))
    if f"{torch_name}.bias" in sd:
        set_in(tree, flax_path + ["bias"], np.asarray(sd[f"{torch_name}.bias"]))


def _mha(sd, tname, tree, fpath, is_self: bool, qk_rms: bool):
    """reference model/attention/modules.py MultiHeadAttention."""
    if is_self:
        _linear(sd, f"{tname}.to_qkv", tree, fpath + ["to_qkv"])
    else:
        _linear(sd, f"{tname}.to_q", tree, fpath + ["to_q"])
        _linear(sd, f"{tname}.to_kv", tree, fpath + ["to_kv"])
    _linear(sd, f"{tname}.to_out", tree, fpath + ["to_out"])
    if qk_rms:
        for n in ("q_rms_norm", "k_rms_norm"):
            key = f"{tname}.{n}.gamma"
            if key in sd:
                set_in(tree, fpath + [n, "gamma"], np.asarray(sd[key]))


def convert_dit(state_dict: Dict[str, Any], num_blocks: int = 12,
                qk_rms_norm: bool = True, no_temporal_attn: bool = False,
                share_mod: bool = False) -> Dict:
    """model/dit.py DiT state dict -> flax params {'params': ...}."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    _linear(sd, "input_layer", p, ["input_layer"])
    _linear(sd, "t_embedder.mlp.0", p, ["t_embedder", "mlp_0"])
    _linear(sd, "t_embedder.mlp.2", p, ["t_embedder", "mlp_2"])
    _linear(sd, "image_cond_proj", p, ["image_cond_proj"])
    _linear(sd, "static_cond_proj", p, ["static_cond_proj"])
    if share_mod:
        _linear(sd, "adaLN_modulation.1", p, ["adaLN_modulation"])
    if "pos_embedder" in {k.split(".")[0] for k in sd}:
        if "pos_embedder" in sd:  # learnable pe is a bare parameter
            p["pos_emb"] = np.asarray(sd["pos_embedder"])
    for i in range(num_blocks):
        b = f"blocks.{i}"
        fp = [f"blocks_{i}"]
        if not share_mod:
            _linear(sd, f"{b}.adaLN_modulation.1", p, fp + ["adaLN_modulation"])
            if not no_temporal_attn:
                _linear(sd, f"{b}.adaLN_modulation_temporal.1", p,
                        fp + ["adaLN_modulation_temporal"])
        _layernorm(sd, f"{b}.norm3", p, fp + ["norm3"])
        _layernorm(sd, f"{b}.norm4", p, fp + ["norm4"])
        _mha(sd, f"{b}.spatial_self_attn", p, fp + ["spatial_self_attn"],
             True, qk_rms_norm)
        if not no_temporal_attn:
            _mha(sd, f"{b}.temporal_self_attn", p, fp + ["temporal_self_attn"],
                 True, qk_rms_norm)
        _mha(sd, f"{b}.image_cross_attn", p, fp + ["image_cross_attn"], False, False)
        _mha(sd, f"{b}.static_cross_attn", p, fp + ["static_cross_attn"], False, False)
        _linear(sd, f"{b}.mlp.mlp.0", p, fp + ["mlp", "mlp_0"])
        _linear(sd, f"{b}.mlp.mlp.2", p, fp + ["mlp", "mlp_2"])
    _linear(sd, "final_layer.adaLN_modulation.1", p, ["final_layer", "adaLN_modulation"])
    _linear(sd, "final_layer.linear", p, ["final_layer", "linear"])
    return {"params": p}


def convert_motion_vae(state_dict: Dict[str, Any], depth: int = 12) -> Dict:
    """model/autoencoder.py GSKLTemporalVariationalAutoEncoder -> flax."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    _linear(sd, "input_embedding.0", p, ["input_embedding"])
    _linear(sd, "gs_embedding.0", p, ["gs_embedding"])
    # encoder cross block: cross_attend_blocks.0 = PreNorm(Attention),
    # .1 = PreNorm(FeedForward)
    _linear(sd, "cross_attend_blocks.0.fn.to_q", p, ["enc_cross", "to_q"])
    _linear(sd, "cross_attend_blocks.0.fn.to_kv", p, ["enc_cross", "to_kv"])
    _linear(sd, "cross_attend_blocks.0.fn.to_out", p, ["enc_cross", "to_out"])
    _linear(sd, "cross_attend_blocks.1.fn.net.0", p, ["enc_ff", "net_0"])
    _linear(sd, "cross_attend_blocks.1.fn.net.2", p, ["enc_ff", "net_2"])
    _linear(sd, "mean_fc", p, ["mean_fc"])
    _linear(sd, "logvar_fc", p, ["logvar_fc"])
    _linear(sd, "proj", p, ["proj"])
    for i in range(depth):
        _linear(sd, f"layers.{i}.0.fn.to_q", p, [f"latent_attn_{i}", "to_q"])
        _linear(sd, f"layers.{i}.0.fn.to_kv", p, [f"latent_attn_{i}", "to_kv"])
        _linear(sd, f"layers.{i}.0.fn.to_out", p, [f"latent_attn_{i}", "to_out"])
        _linear(sd, f"layers.{i}.1.fn.net.0", p, [f"latent_ff_{i}", "net_0"])
        _linear(sd, f"layers.{i}.1.fn.net.2", p, [f"latent_ff_{i}", "net_2"])
    _linear(sd, "decoder_cross_attn.fn.to_q", p, ["dec_cross", "to_q"])
    _linear(sd, "decoder_cross_attn.fn.to_kv", p, ["dec_cross", "to_kv"])
    _linear(sd, "decoder_cross_attn.fn.to_out", p, ["dec_cross", "to_out"])
    _linear(sd, "to_outputs", p, ["to_outputs"])
    return {"params": p}


def _old_qkv_to_new(w: np.ndarray, num_heads: int) -> np.ndarray:
    """Permute a fused-qkv tensor from the reference static VAE's OLD
    attention layout to the standard one.

    The VAE builds its sparse attention with use_old_attn_impl=True
    (model/sparse_voxel_diffusion/sparse_transformer_vae.py:31;
    sparse/attention/modules.py:161-164): to_qkv output channels are
    interpreted as (H, 3, Ch) — reshape to heads first, THEN chunk q/k/v —
    whereas the standard path (and this framework) uses (3, H, Ch).
    Applies to the leading axis of weight [3C, Cin] and bias [3C].
    """
    three_c = w.shape[0]
    ch = three_c // (3 * num_heads)
    return (
        w.reshape(num_heads, 3, ch, *w.shape[1:])
        .swapaxes(0, 1)
        .reshape(w.shape)
    )


def convert_static_vae(
    state_dict: Dict[str, Any], num_blocks: int = 12, num_heads: int = 12,
    old_qkv_layout: bool = False,
) -> Dict:
    """model/sparse_voxel_diffusion/sparse_transformer_vae.py -> flax.

    Note flax submodule paths: SparseLinear wraps a Dense named Dense_0.
    old_qkv_layout: set for checkpoints trained with use_old_attn_impl=True
    (the class default; the SHIPPED configs set it false,
    configs/diffusion.yml:57 / vae.yml:30, so released weights are new-layout).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    def slinear(tname, fpath):
        _linear(sd, tname, p, fpath + ["Dense_0"])

    slinear("input_layer", ["input_layer"])
    slinear("to_latent", ["to_latent"])
    slinear("from_latent", ["from_latent"])
    slinear("out_layer", ["out_layer"])
    for prefix, fprefix in (("encoder", "enc"), ("decoder", "dec")):
        for i in range(num_blocks):
            b = f"{prefix}.{i}"
            fp = [f"{fprefix}_{i}"]
            if old_qkv_layout:
                sd[f"{b}.attn.to_qkv.weight"] = _old_qkv_to_new(
                    sd[f"{b}.attn.to_qkv.weight"], num_heads
                )
                if f"{b}.attn.to_qkv.bias" in sd:
                    sd[f"{b}.attn.to_qkv.bias"] = _old_qkv_to_new(
                        sd[f"{b}.attn.to_qkv.bias"], num_heads
                    )
            _mha(sd, f"{b}.attn", p, fp + ["attn"], True, False)
            slinear(f"{b}.mlp.mlp.0", fp + ["mlp", "mlp_0"])
            slinear(f"{b}.mlp.mlp.2", fp + ["mlp", "mlp_2"])
    return {"params": p}


def convert_static_vae_to_slat_decoder(
    state_dict: Dict[str, Any], num_blocks: int = 12
) -> Dict:
    """The GVF checkpoint surgery (reference trellis/models/__init__.py:46-76):
    remap the static VAE's DECODER half onto an SLatGaussianDecoder —
    `decoder.{i}.` -> torso blocks, `from_latent.` -> torso input layer,
    `out_layer.` stays the output head; encoder weights are dropped.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    def slinear(tname, fpath):
        _linear(sd, tname, p, fpath + ["Dense_0"])

    slinear("from_latent", ["torso", "input_layer"])
    for i in range(num_blocks):
        b = f"decoder.{i}"
        fp = ["torso", f"blocks_{i}"]
        _mha(sd, f"{b}.attn", p, fp + ["attn"], True, False)
        slinear(f"{b}.mlp.mlp.0", fp + ["mlp", "mlp_0"])
        slinear(f"{b}.mlp.mlp.2", fp + ["mlp", "mlp_2"])
    slinear("out_layer", ["out_layer"])
    return {"params": p}


def strip_prefix(state_dict: Dict[str, Any], prefix: str = "module.") -> Dict[str, Any]:
    """Remove DDP 'module.' prefixes (reference main_latent.py:29-33)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.safetensors state dict as numpy (torch-cpu IO)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in strip_prefix(sd).items()}


def convert_dinov2(state_dict: Dict[str, Any], depth: int = 24) -> Dict:
    """facebookresearch/dinov2 ViT (with registers) torch state dict ->
    flax params for models/dinov2.DinoV2.

    Key map (torch hub `dinov2_vitl14_reg` layout):
      cls_token/pos_embed/register_tokens     bare parameters
      patch_embed.proj                        Conv2d -> patch_embed/proj
      blocks.N.{norm1,norm2}                  LayerNorm -> blocks_N/norm*
      blocks.N.attn.{qkv,proj}                -> blocks_N/attn/{to_qkv,to_out}
        (timm qkv stacking [3C, C] with (3, H, hd) unpack order matches the
         flax reshape in nn/attention.py, so a plain transpose is exact)
      blocks.N.{ls1,ls2}.gamma                LayerScale -> ls{1,2}_gamma
      blocks.N.mlp.{fc1,fc2}                  -> blocks_N/mlp/{fc1,fc2}
      norm                                    final LayerNorm
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    if "register_tokens" in sd:
        p["register_tokens"] = sd["register_tokens"]
    set_in(p, ["patch_embed", "proj", "kernel"],
           _conv2d(sd["patch_embed.proj.weight"]))
    set_in(p, ["patch_embed", "proj", "bias"],
           np.asarray(sd["patch_embed.proj.bias"]))
    for i in range(depth):
        b = f"blocks.{i}"
        fp = [f"blocks_{i}"]
        _layernorm(sd, f"{b}.norm1", p, fp + ["norm1"])
        _layernorm(sd, f"{b}.norm2", p, fp + ["norm2"])
        _linear(sd, f"{b}.attn.qkv", p, fp + ["attn", "to_qkv"])
        _linear(sd, f"{b}.attn.proj", p, fp + ["attn", "to_out"])
        set_in(p, fp + ["ls1_gamma"], np.asarray(sd[f"{b}.ls1.gamma"]))
        set_in(p, fp + ["ls2_gamma"], np.asarray(sd[f"{b}.ls2.gamma"]))
        _linear(sd, f"{b}.mlp.fc1", p, fp + ["mlp", "fc1"])
        _linear(sd, f"{b}.mlp.fc2", p, fp + ["mlp", "fc2"])
    _layernorm(sd, "norm", p, ["norm"])
    return {"params": p}


def convert_clip_visual(state_dict: Dict[str, Any], depth: int = 12) -> Dict:
    """OpenAI CLIP `visual.*` torch state dict -> flax params for
    models/clip.CLIPImageEncoder. The `visual.` prefix is optional.

    nn.MultiheadAttention's packed in_proj stacks [q; k; v] along dim 0 and
    splits heads as [H, hd] — both match the flax to_qkv reshape, so the
    transpose alone is exact."""
    sd = {}
    for k, v in state_dict.items():
        sd[k[7:] if k.startswith("visual.") else k] = np.asarray(v)
    p: Dict = {}
    set_in(p, ["conv1", "kernel"], _conv2d(sd["conv1.weight"]))
    p["class_embedding"] = sd["class_embedding"]
    p["positional_embedding"] = sd["positional_embedding"]
    _layernorm(sd, "ln_pre", p, ["ln_pre"])
    for i in range(depth):
        b = f"transformer.resblocks.{i}"
        fp = [f"resblocks_{i}"]
        _layernorm(sd, f"{b}.ln_1", p, fp + ["ln_1"])
        set_in(p, fp + ["attn", "to_qkv", "kernel"],
               _t(sd[f"{b}.attn.in_proj_weight"]))
        set_in(p, fp + ["attn", "to_qkv", "bias"],
               np.asarray(sd[f"{b}.attn.in_proj_bias"]))
        _linear(sd, f"{b}.attn.out_proj", p, fp + ["attn", "to_out"])
        _layernorm(sd, f"{b}.ln_2", p, fp + ["ln_2"])
        _linear(sd, f"{b}.mlp.c_fc", p, fp + ["c_fc"])
        _linear(sd, f"{b}.mlp.c_proj", p, fp + ["c_proj"])
    _layernorm(sd, "ln_post", p, ["ln_post"])
    p["proj"] = sd["proj"]
    return {"params": p}


def _mcb_block(sd, b, p, fp, qk_rms: bool, qk_rms_cross: bool,
               share_mod: bool):
    """trellis/modules/transformer/modulated.py ModulatedCrossBlock ->
    nn/transformer.ModulatedCrossBlock (names align 1:1)."""
    if not share_mod:
        _linear(sd, f"{b}.adaLN_modulation.1", p, fp + ["adaLN_modulation"])
    _layernorm(sd, f"{b}.norm2", p, fp + ["norm2"])
    _mha(sd, f"{b}.self_attn", p, fp + ["self_attn"], True, qk_rms)
    _mha(sd, f"{b}.cross_attn", p, fp + ["cross_attn"], False, qk_rms_cross)
    _linear(sd, f"{b}.mlp.mlp.0", p, fp + ["mlp", "mlp_0"])
    _linear(sd, f"{b}.mlp.mlp.2", p, fp + ["mlp", "mlp_2"])


def convert_ss_flow(state_dict: Dict[str, Any], num_blocks: int = 24,
                    in_channels: int = 8, out_channels: int = 8,
                    patch_size: int = 2, share_mod: bool = False,
                    qk_rms_norm: bool = False,
                    qk_rms_norm_cross: bool = False) -> Dict:
    """trellis/models/sparse_structure_flow.py SparseStructureFlowModel ->
    flax params for models/trellis/ss_flow.SparseStructureFlowModel.

    Patchify channel orders differ: torch packs token features as
    [c * p^3 + offset] (spatial.py:28-30 keeps C major), ours as
    [offset * C + c] (patchify_3d keeps offsets major) — the input/output
    projection matrices are permuted accordingly, everything else maps 1:1.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    p3 = patch_size**3

    # input_layer: torch weight [C_model, C_in*p3] col (c, off) ->
    # our kernel row (off, c)
    w_in = _t(sd["input_layer.weight"])  # [C_in*p3, C_model]
    perm_in = np.asarray(
        [c * p3 + off for off in range(p3) for c in range(in_channels)]
    )
    set_in(p, ["input_layer", "kernel"], w_in[perm_in])
    set_in(p, ["input_layer", "bias"], np.asarray(sd["input_layer.bias"]))

    _linear(sd, "t_embedder.mlp.0", p, ["t_embedder", "mlp_0"])
    _linear(sd, "t_embedder.mlp.2", p, ["t_embedder", "mlp_2"])
    if share_mod:
        _linear(sd, "adaLN_modulation.1", p, ["adaLN_modulation"])

    for i in range(num_blocks):
        _mcb_block(sd, f"blocks.{i}", p, [f"blocks_{i}"], qk_rms_norm,
                   qk_rms_norm_cross, share_mod)

    # out_layer: torch weight rows (c_out, off) -> our kernel cols (off, c)
    w_out = _t(sd["out_layer.weight"])  # [C_model, C_out*p3]
    perm_out = np.asarray(
        [c * p3 + off for off in range(p3) for c in range(out_channels)]
    )
    set_in(p, ["out_layer", "kernel"], w_out[:, perm_out])
    set_in(p, ["out_layer", "bias"], np.asarray(sd["out_layer.bias"])[perm_out])
    return {"params": p}


def convert_ss_decoder(state_dict: Dict[str, Any],
                       channels=(512, 128, 32), num_res_blocks: int = 2,
                       num_res_blocks_middle: int = 2,
                       out_channels_up: Optional[Dict[int, int]] = None) -> Dict:
    """trellis SparseStructureDecoder (torch, sparse_structure_vae.py:210) ->
    flax models/trellis/ss_vae.SparseStructureDecoder.

    Upsample convs: torch pixel_shuffle_3d keeps C major over the 8 offsets
    (spatial.py:4-13), ours keeps offsets major — output channels permuted.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    def conv(tname, fpath, out_perm=None):
        w = _conv3d(sd[f"{tname}.weight"])
        b = np.asarray(sd[f"{tname}.bias"])
        if out_perm is not None:
            w = w[..., out_perm]
            b = b[out_perm]
        set_in(p, fpath + ["kernel"], w)
        set_in(p, fpath + ["bias"], b)

    def res(tname, fpath):
        _layernorm(sd, f"{tname}.norm1", p, fpath + ["norm1"])
        _layernorm(sd, f"{tname}.norm2", p, fpath + ["norm2"])
        conv(f"{tname}.conv1", fpath + ["conv1"])
        conv(f"{tname}.conv2", fpath + ["conv2"])
        if f"{tname}.skip_connection.weight" in sd:
            conv(f"{tname}.skip_connection", fpath + ["skip_connection"])

    conv("input_layer", ["input_layer"])
    for j in range(num_res_blocks_middle):
        res(f"middle_block.{j}", [f"middle_{j}"])
    bi = 0
    for i, ch in enumerate(channels):
        for j in range(num_res_blocks):
            res(f"blocks.{bi}", [f"block_{i}_{j}"])
            bi += 1
        if i < len(channels) - 1:
            c_out = channels[i + 1]
            # torch out channel (c, f1, f2, f3) -> ours (f1, f2, f3, c)
            perm = np.asarray(
                [c * 8 + off for off in range(8) for c in range(c_out)]
            )
            conv(f"blocks.{bi}.conv", [f"up_{i}", "conv"], out_perm=perm)
            bi += 1
    _layernorm(sd, "out_layer.0", p, ["out_norm"])
    conv("out_layer.2", ["out_layer"])
    return {"params": p}


# -- TRELLIS SLat stage -------------------------------------------------------


def _spconv(sd, tname, tree, fpath):
    """spconv 2.x SubMConv3d weight (KRSC: [O, k0, k1, k2, I]) -> flax
    SparseConv3d kernel [K^3, I, O]. Both sides follow dense Conv3d
    cross-correlation semantics with center padding and row-major kernel
    offset enumeration, so the map is a pure transpose+reshape."""
    w = np.asarray(sd[f"{tname}.weight"])
    o, k0, k1, k2, i = w.shape
    w = np.transpose(w, (1, 2, 3, 4, 0)).reshape(k0 * k1 * k2, i, o)
    set_in(tree, fpath + ["kernel"], w)
    if f"{tname}.bias" in sd:
        set_in(tree, fpath + ["bias"], np.asarray(sd[f"{tname}.bias"]))


def _slat_res_block(sd, b, p, fp):
    """reference structured_latent_flow.SparseResBlock3d -> flax
    models/trellis/slat_flow.SparseResBlock3d (norm2 is affine-free)."""
    _layernorm(sd, f"{b}.norm1", p, fp + ["norm1", "LayerNorm_0"])
    _spconv(sd, f"{b}.conv1.conv", p, fp + ["conv1"])
    _spconv(sd, f"{b}.conv2.conv", p, fp + ["conv2"])
    _linear(sd, f"{b}.emb_layers.1", p, fp + ["emb_layers"])
    if f"{b}.skip_connection.weight" in sd:
        _linear(sd, f"{b}.skip_connection", p,
                fp + ["skip_connection", "Dense_0"])


def _mscb_block(sd, b, p, fp, qk_rms, qk_rms_cross, share_mod):
    """trellis/modules/sparse/transformer/modulated.py
    ModulatedSparseTransformerCrossBlock -> flax ModulatedSparseCrossBlock
    (norm1/norm3 affine-free; norm2 affine)."""
    if not share_mod:
        _linear(sd, f"{b}.adaLN_modulation.1", p, fp + ["adaLN_modulation"])
    _layernorm(sd, f"{b}.norm2", p, fp + ["norm2", "LayerNorm_0"])
    _mha(sd, f"{b}.self_attn", p, fp + ["self_attn"], True, qk_rms)
    _mha(sd, f"{b}.cross_attn", p, fp + ["cross_attn"], False, qk_rms_cross)
    _linear(sd, f"{b}.mlp.mlp.0", p, fp + ["mlp", "mlp_0", "Dense_0"])
    _linear(sd, f"{b}.mlp.mlp.2", p, fp + ["mlp", "mlp_2", "Dense_0"])


def convert_slat_flow(
    state_dict: Dict[str, Any],
    num_blocks: int = 24,
    io_block_channels=(128,),
    num_io_res_blocks: int = 2,
    share_mod: bool = False,
    qk_rms_norm: bool = False,
    qk_rms_norm_cross: bool = False,
) -> Dict:
    """trellis/models/structured_latent_flow.py SLatFlowModel:234 ->
    flax models/trellis/slat_flow.SLatFlowModel. Loading layout per
    trellis/models/__init__.py:78-97 (slat_flow_img_dit_L_64l8p2)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}

    _linear(sd, "input_layer", p, ["input_layer", "Dense_0"])
    _linear(sd, "t_embedder.mlp.0", p, ["t_embedder", "mlp_0"])
    _linear(sd, "t_embedder.mlp.2", p, ["t_embedder", "mlp_2"])
    if share_mod:
        _linear(sd, "adaLN_modulation.1", p, ["adaLN_modulation"])

    n_in = len(io_block_channels) * num_io_res_blocks
    for i in range(n_in):
        _slat_res_block(sd, f"input_blocks.{i}", p, [f"input_blocks_{i}"])
    for i in range(num_blocks):
        _mscb_block(sd, f"blocks.{i}", p, [f"blocks_{i}"],
                    qk_rms_norm, qk_rms_norm_cross, share_mod)
    for i in range(n_in):
        _slat_res_block(sd, f"out_blocks.{i}", p, [f"out_blocks_{i}"])
    _linear(sd, "out_layer", p, ["out_layer", "Dense_0"])
    return {"params": p}


def _slat_torso(sd, p, num_blocks, qk_rms):
    """structured_latent_vae/base.py SparseTransformerBase -> flax
    slat_decoders.SparseTransformerBase (norms are affine-free;
    pos_embedder is parameter-free)."""
    _linear(sd, "input_layer", p, ["torso", "input_layer", "Dense_0"])
    for i in range(num_blocks):
        b = f"blocks.{i}"
        fp = ["torso", f"blocks_{i}"]
        _mha(sd, f"{b}.attn", p, fp + ["attn"], True, qk_rms)
        _linear(sd, f"{b}.mlp.mlp.0", p, fp + ["mlp", "mlp_0", "Dense_0"])
        _linear(sd, f"{b}.mlp.mlp.2", p, fp + ["mlp", "mlp_2", "Dense_0"])


def convert_slat_encoder(state_dict: Dict[str, Any], num_blocks: int = 12,
                         qk_rms_norm: bool = False) -> Dict:
    """structured_latent_vae/encoder.py SLatEncoder -> flax SLatEncoder."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    _slat_torso(sd, p, num_blocks, qk_rms_norm)
    _linear(sd, "out_layer", p, ["out_layer", "Dense_0"])
    return {"params": p}


def convert_slat_gs_decoder(state_dict: Dict[str, Any], num_blocks: int = 12,
                            qk_rms_norm: bool = False) -> Dict:
    """True-TRELLIS SLatGaussianDecoder (decoder_gs.py:117) -> flax
    SLatGaussianDecoder. (The GVF static-VAE checkpoint surgery variant is
    convert_static_vae_to_slat_decoder above; this one loads the released
    TRELLIS-image-large safetensors layout.) The offset_perturbation buffer
    is parameter-free on our side (recomputed from the Hammersley sequence)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    _slat_torso(sd, p, num_blocks, qk_rms_norm)
    _linear(sd, "out_layer", p, ["out_layer", "Dense_0"])
    return {"params": p}


def convert_slat_rf_decoder(state_dict: Dict[str, Any], num_blocks: int = 12,
                            qk_rms_norm: bool = False) -> Dict:
    """SLatRadianceFieldDecoder (decoder_rf.py) -> flax
    SLatRadianceFieldDecoder (same torso + out_layer shape)."""
    return convert_slat_gs_decoder(state_dict, num_blocks, qk_rms_norm)


def _groupnorm(sd, tname, tree, fpath):
    set_in(tree, fpath + ["scale"], np.asarray(sd[f"{tname}.weight"]))
    set_in(tree, fpath + ["bias"], np.asarray(sd[f"{tname}.bias"]))


def convert_slat_mesh_decoder(state_dict: Dict[str, Any], num_blocks: int = 12,
                              qk_rms_norm: bool = False) -> Dict:
    """SLatMeshDecoder (decoder_mesh.py:71) -> flax SLatMeshDecoderRef.
    Torso via the shared map; the two SparseSubdivideBlock3d upsamples map
    act_layers.0 -> act_norm, out_layers.{0,1,3} -> conv1/norm2/conv2,
    skip_connection -> skip (1x1 conv; present because channels shrink)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    p: Dict = {}
    _slat_torso(sd, p, num_blocks, qk_rms_norm)
    for i in (0, 1):
        b = f"upsample.{i}"
        fp = [f"upsample_{i}"]
        _groupnorm(sd, f"{b}.act_layers.0", p, fp + ["act_norm"])
        _spconv(sd, f"{b}.out_layers.0.conv", p, fp + ["conv1"])
        _groupnorm(sd, f"{b}.out_layers.1", p, fp + ["norm2"])
        _spconv(sd, f"{b}.out_layers.3.conv", p, fp + ["conv2"])
        if f"{b}.skip_connection.conv.weight" in sd:
            _spconv(sd, f"{b}.skip_connection.conv", p, fp + ["skip"])
    _linear(sd, "out_layer", p, ["out_layer", "Dense_0"])
    return {"params": p}
