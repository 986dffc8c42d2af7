"""Multi-task loss balancing (reference: utils/task_balancing.py).

* NoWeightingStrategy — identity (losses are summed by the caller).
* UncertaintyWeightingStrategy — learnable per-task log-variances s_i:
  weighted_i = exp(-s_i) * L_i + s_i, zeroed when L_i == 0 (task dropped
  this step; reference :33-39). Implemented as a flax module whose params
  live under a separate 'balancer' tree so the optimizer can give them
  their own lr scale (run_pretraining_multimae.py:385-390).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp


class NoWeightingStrategy(nn.Module):
    tasks: Sequence[str] = ()

    @nn.compact
    def __call__(self, task_losses: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return dict(task_losses)


class UncertaintyWeightingStrategy(nn.Module):
    tasks: Sequence[str]

    @nn.compact
    def __call__(self, task_losses: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        log_vars = self.param(
            "log_vars", nn.initializers.zeros, (len(self.tasks),)
        )
        out = {}
        for i, task in enumerate(self.tasks):
            loss = task_losses[task]
            weighted = jnp.exp(-log_vars[i]) * loss + log_vars[i]
            out[task] = jnp.where(loss != 0.0, weighted, 0.0)
        return out


def build_balancer(strategy: str, tasks: Sequence[str]) -> nn.Module:
    if strategy in ("none", "no", "nowe", "no_weighting"):
        return NoWeightingStrategy(tasks=tuple(tasks))
    if strategy in ("uncertainty", "uncert"):
        return UncertaintyWeightingStrategy(tasks=tuple(tasks))
    raise ValueError(f"Unknown loss balancing strategy: {strategy}")
