"""Rectified-flow Euler samplers with CFG / guidance-interval.

Re-design of trellis/pipelines/samplers/flow_euler.py:11-245 (+ the CFG and
guidance-interval mixins): the whole sampling loop is a `lax.scan` over a
precomputed (host-side numpy) rescaled t-grid, so the 12-step TRELLIS
sparse-structure and SLat sampling passes each compile to one XLA graph.
The guidance interval is applied STATICALLY: the host-side t grid is split
into contiguous runs, scanning the 2-pass CFG step inside the interval and
the single cond pass outside (see sample). A per-step lax.cond skip was
measured SLOWER (it breaks scan pipelining; see predict_v), and CFG can
optionally run as one 2B-batched model call (cfg_batched, off by default —
also measured slower).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def t_schedule(steps: int, rescale_t: float = 1.0) -> np.ndarray:
    """Descending t grid [steps+1] from 1 to 0, with the reference's
    rescale (flow_euler.py:107-108)."""
    t_seq = np.linspace(1.0, 0.0, steps + 1)
    return rescale_t * t_seq / (1 + (rescale_t - 1) * t_seq)


class FlowEulerSampler:
    """model(x_t, t_input[B], cond) -> velocity v; x_t = (1-t) x_0 + t-ish eps
    with sigma_min floor (reference :24-36)."""

    def __init__(self, sigma_min: float = 0.0):
        self.sigma_min = sigma_min

    def _v_to_xstart_eps(self, x_t, t, v):
        eps = (1 - t) * v + x_t
        x_0 = (1 - self.sigma_min) * x_t - (self.sigma_min + (1 - self.sigma_min) * t) * v
        return x_0, eps

    def _inference(self, model: Callable, x_t, t, cond):
        tb = jnp.full((x_t.shape[0] if hasattr(x_t, "shape") else 1,), 1000.0 * t)
        return model(x_t, tb, cond)

    def predict_v(self, model, x_t, t, cond, neg_cond=None,
                  cfg_strength: float = 0.0, cfg_interval=None,
                  cfg_batched: bool = False):
        """CFG velocity. With cfg_batched the cond and neg passes run as ONE
        model call on a 2B batch; the model must accept a doubled leading
        dim (broadcast any closed-over per-batch state, see pipelines).

        Both "optimizations" were MEASURED SLOWER than this plain form on the
        v5e SLat flow (12 steps, benchmarks/slat_cfg_variants.py):
        2-call + where-select 2718 ms; skipping the neg pass outside the
        interval via lax.cond 3104 ms (the conditional costs more than the
        skipped work — it breaks XLA's scan pipelining); 2B-batched call
        3949 ms (the doubled windowed-attention sort/pad path costs more
        than the saved dispatch). Hence: where-select always, cfg_batched
        off by default."""
        if neg_cond is None or cfg_strength == 0.0:
            return self._inference(model, x_t, t, cond)

        if cfg_batched:
            x2 = jax.tree.map(lambda a: jnp.concatenate([a, a], axis=0), x_t)
            c2 = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0), cond, neg_cond
            )
            out = self._inference(model, x2, t, c2)
            pred = jax.tree.map(lambda a: a[: a.shape[0] // 2], out)
            neg = jax.tree.map(lambda a: a[a.shape[0] // 2:], out)
        else:
            pred = self._inference(model, x_t, t, cond)
            neg = self._inference(model, x_t, t, neg_cond)
        guided = jax.tree.map(
            lambda p, n: (1 + cfg_strength) * p - cfg_strength * n, pred, neg
        )
        if cfg_interval is None:
            return guided
        lo, hi = cfg_interval
        in_interval = jnp.logical_and(t >= lo, t <= hi)
        return jax.tree.map(
            lambda g, p: jnp.where(in_interval, g, p), guided, pred
        )

    def sample(
        self,
        model: Callable,
        noise,
        cond: Any = None,
        neg_cond: Any = None,
        steps: int = 50,
        rescale_t: float = 1.0,
        cfg_strength: float = 0.0,
        cfg_interval=None,
        cfg_batched: bool = False,
    ):
        """Returns dict(samples=...). The scan carries only x.

        The t grid is host-side numpy, so a guidance interval partitions the
        steps STATICALLY into contiguous runs: runs inside the interval scan
        with the 2-pass CFG step, runs outside scan with the single cond
        pass. Unlike the measured-slower per-step lax.cond, this never
        branches inside a scan — out-of-interval steps simply compile
        without the neg pass (numerics identical to the where-select form,
        which always computed both and discarded one)."""
        ts_np = t_schedule(steps, rescale_t)
        pairs_np = np.stack([ts_np[:-1], ts_np[1:]], axis=1)
        use_cfg = neg_cond is not None and cfg_strength != 0.0

        def make_step(with_cfg: bool):
            def step(x, tt):
                t, t_prev = tt
                v = self.predict_v(
                    model, x, t, cond,
                    neg_cond if with_cfg else None,
                    cfg_strength if with_cfg else 0.0,
                    None, cfg_batched,
                )
                return x - (t - t_prev) * v, None
            return step

        if use_cfg and cfg_interval is not None:
            lo, hi = cfg_interval
            in_i = (pairs_np[:, 0] >= lo) & (pairs_np[:, 0] <= hi)
            x = noise
            i = 0
            while i < steps:
                j = i
                while j < steps and in_i[j] == in_i[i]:
                    j += 1
                seg = jnp.asarray(pairs_np[i:j], jnp.float32)
                x, _ = jax.lax.scan(make_step(bool(in_i[i])), x, seg)
                i = j
            return {"samples": x}

        pairs = jnp.asarray(pairs_np, jnp.float32)
        x, _ = jax.lax.scan(make_step(use_cfg), noise, pairs)
        return {"samples": x}


class FlowEulerCfgSampler(FlowEulerSampler):
    """CFG variant (reference flow_euler.py:120)."""

    def sample(self, model, noise, cond, neg_cond, steps=50, rescale_t=1.0,
               cfg_strength=3.0, cfg_batched=False, **kw):
        return super().sample(
            model, noise, cond, neg_cond, steps=steps, rescale_t=rescale_t,
            cfg_strength=cfg_strength, cfg_batched=cfg_batched,
        )


class FlowEulerGuidanceIntervalSampler(FlowEulerSampler):
    """CFG-with-interval variant (reference flow_euler.py:160)."""

    def sample(self, model, noise, cond, neg_cond, steps=50, rescale_t=1.0,
               cfg_strength=3.0, cfg_interval=(0.0, 1.0), cfg_batched=False,
               **kw):
        return super().sample(
            model, noise, cond, neg_cond, steps=steps, rescale_t=rescale_t,
            cfg_strength=cfg_strength, cfg_interval=cfg_interval,
            cfg_batched=cfg_batched,
        )
