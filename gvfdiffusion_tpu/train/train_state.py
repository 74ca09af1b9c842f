"""Train state: params + optax optimizer + EMA.

Replaces the reference's TrainLoop optimizer plumbing (train_latent.py:209-229:
clip-grad-1.0 -> AdamW -> 1000-step linear warmup; EMA 0.9999 via
model/nn.py:277 update_ema) with an optax chain inside one jitted step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


def make_optimizer(
    lr: float = 5e-5,
    warmup_steps: int = 1000,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """clip(1.0) -> adamw(lr linear-warmup) (reference train_latent.py:93-105).

    grad_accum > 1 wraps the chain in optax.MultiSteps: gradients average
    across micro-steps and the inner update fires every `grad_accum` calls
    (the reference's accelerator.accumulate, train_latent.py:188).
    """
    if warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        schedule = lr
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def freeze_subtrees(
    tx: optax.GradientTransformation, params, prefixes: tuple
) -> optax.GradientTransformation:
    """Zero updates for top-level param subtrees whose name starts with any
    prefix (the reference's requires_grad_(False) encoder freeze,
    sparse_transformer_vae.py:147-149). Frozen params also drop out of the
    clip/adamw state inside tx via the multi_transform partition.
    """

    def label_tree(tree):
        return {
            k: jax.tree.map(
                lambda _: "frozen" if any(k.startswith(p) for p in prefixes)
                else "train",
                v,
            )
            for k, v in tree.items()
        }

    labels = {k: label_tree(v) for k, v in params.items()}
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=params,
    )


def apply_updates(
    state: TrainState,
    grads,
    tx: optax.GradientTransformation,
    ema_rate: float = 0.9999,
) -> TrainState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = jax.tree.map(
        lambda e, p: e * ema_rate + p * (1.0 - ema_rate),
        state.ema_params,
        new_params,
    )
    return TrainState(
        step=state.step + 1,
        params=new_params,
        opt_state=new_opt_state,
        ema_params=new_ema,
    )
