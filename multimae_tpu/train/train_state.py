"""Train state: params + optimizer state + step, as a flax pytree struct."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {'model': ..., 'balancer': ...} or just model params
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None
    batch_stats: Optional[Any] = None

    @classmethod
    def create(cls, *, params, tx, ema_decay: Optional[float] = None,
               batch_stats=None):
        opt_state = tx.init(params)
        ema = jax.tree.map(jnp.copy, params) if ema_decay is not None else None
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=opt_state,
            tx=tx,
            ema_params=ema,
            batch_stats=batch_stats,
        )

    def apply_gradients(self, grads, skip_update: Optional[jnp.ndarray] = None,
                        ema_decay: Optional[float] = None):
        """One optimizer step; optionally a no-op when skip_update is True
        (the reference's skip-on-grad-norm, utils/native_scaler.py:27-32)."""
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if skip_update is not None:
            new_params = jax.tree.map(
                lambda new, old: jnp.where(skip_update, old, new),
                new_params, self.params,
            )
            new_opt_state = jax.tree.map(
                lambda new, old: jnp.where(skip_update, old, new)
                if isinstance(new, jnp.ndarray) and new.shape == old.shape
                else new,
                new_opt_state, self.opt_state,
            )
        new_ema = self.ema_params
        if self.ema_params is not None and ema_decay is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                self.ema_params, new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


class HostEMA:
    """CPU-resident parameter EMA (`--model_ema_force_cpu`).

    The reference's ModelEma with device='cpu' (utils/model_ema.py:18-131)
    keeps the EMA copy in host RAM and pulls the new params over per
    update — trading a full H2D/D2H param transfer per step for
    accelerator memory. Same trade here: `update` device_gets the params
    and blends on the host in float32. Use TrainState.ema_params (the
    on-device path) unless accelerator memory is the constraint.
    """

    def __init__(self, params, decay: float):
        self.decay = float(decay)
        self.params = jax.tree.map(
            lambda p: np.array(jax.device_get(p), dtype=np.float32, copy=True),
            params,
        )

    def update(self, new_params):
        host = jax.device_get(new_params)
        d = self.decay
        self.params = jax.tree.map(
            lambda e, p: e * d + np.asarray(p, dtype=np.float32) * (1.0 - d),
            self.params, host,
        )

    def load(self, saved):
        self.params = jax.tree.map(
            lambda e, s: np.asarray(s, dtype=np.float32).reshape(e.shape),
            self.params, saved,
        )
