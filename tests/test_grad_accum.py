"""Gradient accumulation: MultiSteps averages micro-step grads and fires the
inner update every k calls, matching a single big-batch step."""

import jax
import jax.numpy as jnp
import numpy as np

from gvfdiffusion_tpu.train.train_state import (
    apply_updates, create_train_state, make_optimizer,
)


def test_multisteps_matches_big_batch():
    # quadratic loss; grads of micro-batches average to the big-batch grad
    w0 = jnp.array([1.0, -2.0, 0.5])
    data = jnp.array([[1.0, 2.0, 3.0], [3.0, 1.0, -1.0]])  # two micro-batches

    def grad_for(batch, w):
        return jax.grad(lambda w: jnp.mean((w - batch) ** 2))(w)

    # accumulated: two micro steps with grad_accum=2
    tx_acc = make_optimizer(lr=0.1, warmup_steps=0, grad_clip=1e9, grad_accum=2)
    s = create_train_state(w0, tx_acc)
    s = apply_updates(s, grad_for(data[0], s.params), tx_acc, ema_rate=1.0)
    # after first micro-step, params unchanged
    np.testing.assert_allclose(np.asarray(s.params), np.asarray(w0))
    s = apply_updates(s, grad_for(data[1], s.params), tx_acc, ema_rate=1.0)

    # reference: one step on the averaged gradient
    tx_big = make_optimizer(lr=0.1, warmup_steps=0, grad_clip=1e9)
    sb = create_train_state(w0, tx_big)
    g_avg = jax.tree.map(
        lambda a, b: (a + b) / 2, grad_for(data[0], w0), grad_for(data[1], w0)
    )
    sb = apply_updates(sb, g_avg, tx_big, ema_rate=1.0)

    np.testing.assert_allclose(
        np.asarray(s.params), np.asarray(sb.params), atol=1e-6
    )
