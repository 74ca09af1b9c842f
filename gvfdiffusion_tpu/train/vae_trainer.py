"""Two-phase VAE training (static GS VAE, then joint static+motion).

Re-design of the reference VAE TrainLoop (train_vae.py:23-586):
  Phase A (step < static_vae_steps): static VAE only —
    feats -> SparseTransformerVAE -> to_representation -> render ->
    L1 + 0.2*SSIM + 0.2*LPIPS + 1e-6*KL + vol/opacity regs (sparse_vae.py:303-362)
  Phase B (joint): + motion VAE on per-frame deltas, KNN interpolation loss
    (train_vae.py:305-311), per-(sample,camera) delta renders, dual optimizers
    (static lr x0.1, train_vae.py:105) and dual EMA sets.

Each phase is ONE jitted SPMD step; phase selection happens host-side per
step index (the phases have different dataflow, so they are two compiled
programs rather than one with dead branches).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.sparse_vae import GSConfig, kl_loss, regularization_losses, to_representation
from ..ops.knn import interpolate_deltas
from ..ops.ssim import ssim
from ..render.renderer import GaussianRenderer, RenderOptions
from ..representations.camera import Camera
from ..sparse.tensor import SparseVoxels
from .train_state import TrainState, apply_updates


def render_loss(
    rendered: jnp.ndarray,  # [V, H, W, 3]
    target: jnp.ndarray,    # [V, H, W, 3]
    lambda_ssim: float = 0.2,
    lpips_fn: Optional[Callable] = None,
    lambda_lpips: float = 0.2,
    loss_type: str = "l1",
) -> Dict[str, jnp.ndarray]:
    terms = {}
    if loss_type == "l1":
        terms["render_rec"] = jnp.mean(jnp.abs(rendered - target))
    else:
        terms["render_rec"] = jnp.mean((rendered - target) ** 2)
    loss = terms["render_rec"]
    if lambda_ssim > 0:
        terms["ssim"] = 1.0 - ssim(rendered, target)
        loss = loss + lambda_ssim * terms["ssim"]
    if lpips_fn is not None and lambda_lpips > 0:
        terms["lpips"] = jnp.mean(lpips_fn(rendered, target))
        loss = loss + lambda_lpips * terms["lpips"]
    terms["loss"] = loss
    return terms


def make_static_vae_step(
    vae_apply: Callable,
    tx: optax.GradientTransformation,
    gs_config: GSConfig = GSConfig(),
    render_options: Optional[RenderOptions] = None,
    lambda_ssim: float = 0.2,
    lambda_lpips: float = 0.2,
    lambda_kl: float = 1e-6,
    lambda_vol: float = 10000.0,
    lambda_opacity: float = 0.001,
    lpips_fn: Optional[Callable] = None,
    ema_rate: float = 0.9999,
):
    """Phase-A step: batch = dict(
        feats: SparseVoxels, images [B, V, H, W, 3],
        extrinsics [B, V, 4, 4], intrinsics [B, V, 3, 3]).
    """
    renderer = GaussianRenderer(render_options or RenderOptions())
    res = (render_options or RenderOptions())

    def train_step(state: TrainState, batch, rng: jax.Array):
        feats: SparseVoxels = batch["feats"]
        images = batch["images"]
        B, V, H, W, _ = images.shape

        def loss_fn(params):
            out, mean, logvar = vae_apply(
                params, feats, jax.random.fold_in(rng, 1), True
            )
            gs, valid = to_representation(out, gs_config)

            def render_one(b, v):
                cam = Camera(
                    world_view=batch["extrinsics"][b, v],
                    intrinsics=batch["intrinsics"][b, v],
                    height=H, width=W,
                )
                gs_b = jax.tree.map(
                    lambda a: a[b] if hasattr(a, "ndim") and a.ndim > 1 else a, gs
                )
                return renderer.render(gs_b, cam, valid=valid[b])["render"]

            # vmap over views within each sample; loop samples (B small)
            rendered = jnp.stack([
                jnp.stack([render_one(b, v) for v in range(V)]) for b in range(B)
            ])  # [B, V, H, W, 3]

            rl = render_loss(
                rendered.reshape(B * V, H, W, 3),
                images.reshape(B * V, H, W, 3),
                lambda_ssim, lpips_fn, lambda_lpips,
            )
            kl = kl_loss(mean, logvar, feats.valid)
            reg = regularization_losses(gs, valid, lambda_vol, lambda_opacity)
            loss = rl["loss"] + lambda_kl * kl + reg["loss"]
            terms = dict(rl)
            terms.update(kl=kl, reg_vol=reg["reg_vol"],
                         reg_opacity=reg["reg_opacity"], loss=loss)
            return loss, (terms, rendered)

        (loss, (terms, rendered)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = apply_updates(state, grads, tx, ema_rate)
        terms["grad_norm"] = optax.global_norm(grads)
        return new_state, terms, rendered

    return train_step


def make_joint_vae_step(
    static_apply: Callable,
    motion_apply: Callable,
    static_tx: optax.GradientTransformation,
    motion_tx: optax.GradientTransformation,
    gs_config: GSConfig = GSConfig(),
    render_options: Optional[RenderOptions] = None,
    lambda_ssim: float = 0.2,
    lambda_lpips: float = 0.2,
    lambda_kl: float = 1e-6,
    lambda_xyz: float = 1.0,
    knn_k: int = 8,
    beta: float = 7.0,
    lpips_fn: Optional[Callable] = None,
    ema_rate: float = 0.9999,
):
    """Phase-B step over (static_state, motion_state).

    batch = dict(feats: SparseVoxels, images [B, V, H, W, 3], extrinsics,
    intrinsics, static_pc [B, N, 3], delta_pc [B, T, N, 3],
    frame_images [B, T', H, W, 3], frame_extrinsics, frame_intrinsics,
    frame_idx [B, T'] — the sampled timesteps rendered this step).
    """
    renderer = GaussianRenderer(render_options or RenderOptions())

    def train_step(static_state: TrainState, motion_state: TrainState,
                   batch, rng: jax.Array):
        feats: SparseVoxels = batch["feats"]
        images = batch["images"]
        B, V, H, W, _ = images.shape
        T = batch["delta_pc"].shape[1]
        Tr = batch["frame_images"].shape[1]

        def loss_fn(static_params, motion_params):
            out, mean, logvar = static_apply(
                static_params, feats, jax.random.fold_in(rng, 1), True
            )
            gs, valid = to_representation(out, gs_config)
            static_tensor = gs.to_activated_tensor()  # [B, G, 14]

            motion_out = motion_apply(
                motion_params,
                static_tensor, valid, batch["static_pc"], batch["delta_pc"],
                jax.random.fold_in(rng, 2),
            )
            deltas = motion_out["logits"]  # [B, T, G, 14]

            # KNN interpolation loss on Δxyz (train_vae.py:305-311,486)
            est = interpolate_deltas(
                static_tensor[..., :3], batch["static_pc"], batch["delta_pc"],
                k=knn_k, beta=beta,
            )  # [B, T, G, 3]
            interp_loss = jnp.mean(
                jnp.abs(deltas[..., :3] - est) * valid[:, None, :, None]
            )

            # static render loss
            def render_static(b, v):
                cam = Camera(
                    world_view=batch["extrinsics"][b, v],
                    intrinsics=batch["intrinsics"][b, v], height=H, width=W,
                )
                gs_b = jax.tree.map(
                    lambda a: a[b] if hasattr(a, "ndim") and a.ndim > 1 else a, gs
                )
                return renderer.render(gs_b, cam, valid=valid[b])["render"]

            static_rendered = jnp.stack([
                jnp.stack([render_static(b, v) for v in range(V)])
                for b in range(B)
            ])
            rl_static = render_loss(
                static_rendered.reshape(B * V, H, W, 3),
                images.reshape(B * V, H, W, 3),
                lambda_ssim, lpips_fn, lambda_lpips,
            )

            # deformed renders at sampled frames (detach_static=False:
            # gradients flow into BOTH VAEs — train_vae.py:313-325)
            def render_frame(b, t):
                cam = Camera(
                    world_view=batch["frame_extrinsics"][b, t],
                    intrinsics=batch["frame_intrinsics"][b, t],
                    height=H, width=W,
                )
                gs_b = jax.tree.map(
                    lambda a: a[b] if hasattr(a, "ndim") and a.ndim > 1 else a, gs
                )
                fi = batch["frame_idx"][b, t]
                return renderer.render(
                    gs_b, cam, delta=deltas[b, fi], valid=valid[b]
                )["render"]

            frame_rendered = jnp.stack([
                jnp.stack([render_frame(b, t) for t in range(Tr)])
                for b in range(B)
            ])
            rl_frames = render_loss(
                frame_rendered.reshape(B * Tr, H, W, 3),
                batch["frame_images"].reshape(B * Tr, H, W, 3),
                lambda_ssim, lpips_fn, lambda_lpips,
            )

            kl_static = kl_loss(mean, logvar, feats.valid)
            kl_motion = jnp.mean(motion_out["kl"])
            loss = (
                rl_static["loss"] + rl_frames["loss"]
                + lambda_xyz * interp_loss
                + lambda_kl * (kl_static + kl_motion)
            )
            terms = {
                "loss": loss,
                "static_render": rl_static["render_rec"],
                "frame_render": rl_frames["render_rec"],
                "interp": interp_loss,
                "kl_static": kl_static,
                "kl_motion": kl_motion,
            }
            return loss, terms

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, terms), (g_static, g_motion) = grad_fn(
            static_state.params, motion_state.params
        )
        new_static = apply_updates(static_state, g_static, static_tx, ema_rate)
        new_motion = apply_updates(motion_state, g_motion, motion_tx, ema_rate)
        terms["grad_norm_static"] = optax.global_norm(g_static)
        terms["grad_norm_motion"] = optax.global_norm(g_motion)
        return new_static, new_motion, terms

    return train_step
