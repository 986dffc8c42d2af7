"""Parameter freezing utilities (reference: utils/model.py:109-279).

In JAX, "freezing" a submodule means zeroing its optimizer updates. These
helpers produce the path-predicate consumed by the optimizer factory's
frozen handling, plus tree-level freeze/unfreeze masks for inspection.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax
import numpy as np


def match_submodules(params: Any, submodule_prefixes: Sequence[str]) -> set:
    """Paths (as dotted names) of every leaf under the given top-level
    module prefixes (e.g. ['encoder', 'input_adapters_rgb'])."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    matched = set()
    for path in flat:
        name = ".".join(path)
        if any(path[0].startswith(p) or name.startswith(p)
               for p in submodule_prefixes):
            matched.add(name)
    return matched


def freeze_predicate(submodule_prefixes: Sequence[str]) -> Callable:
    """Predicate(path, leaf, **kw) -> bool for optim_factory's frozen_fn,
    freezing everything under the given prefixes PLUS fixed pos-embs."""
    from multimae_tpu.train.optim_factory import default_frozen

    def frozen(path: Tuple[str, ...], leaf, learnable_pos_emb: bool = False):
        if default_frozen(path, leaf, learnable_pos_emb=learnable_pos_emb):
            return True
        name = ".".join(path)
        return any(
            path[0].startswith(p) or name.startswith(p)
            for p in submodule_prefixes
        )

    return frozen


def count_parameters(params: Any, trainable_only_frozen: Sequence[str] = ()) -> dict:
    """Parameter counts, optionally splitting out frozen prefixes."""
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    frozen_set = match_submodules(params, trainable_only_frozen)
    total = sum(int(np.size(v)) for v in flat.values())
    frozen = sum(
        int(np.size(v)) for p, v in flat.items() if ".".join(p) in frozen_set
    )
    return {"total": total, "frozen": frozen, "trainable": total - frozen}


# --- Signal Propagation Plot statistics (reference utils/model.py:28-106) ---
#
# The reference registers torch forward hooks on fnmatch-selected modules
# and records per-activation channel statistics (dormant utility — no
# caller in the reference either; kept for toolkit parity). The JAX
# equivalent uses flax's capture_intermediates: every module's __call__
# output is recorded functionally, then filtered by the same unix-style
# patterns.


def avg_sq_ch_mean(activation) -> float:
    """Average squared channel mean (channels-last activations)."""
    import jax.numpy as jnp

    a = activation.astype(jnp.float32)
    axes = tuple(range(a.ndim - 1))  # all but channel
    return float(jnp.mean(jnp.mean(a, axis=axes) ** 2))


def avg_ch_var(activation) -> float:
    """Average channel variance (channels-last activations; ddof=1 to
    match torch .var())."""
    import jax.numpy as jnp

    a = activation.astype(jnp.float32)
    axes = tuple(range(a.ndim - 1))
    n = 1
    for ax in axes:
        n *= a.shape[ax]
    mu = jnp.mean(a, axis=axes)
    var = jnp.sum((a - mu) ** 2, axis=axes) / max(n - 1, 1)
    return float(jnp.mean(var))


def extract_spp_stats(
    model,
    variables,
    inputs,
    hook_fn_locs: Sequence[str],
    hook_fns: Sequence[Callable],
    **apply_kwargs,
):
    """Per-module activation statistics for Signal Propagation Plots.

    Runs `model.apply` with capture_intermediates and evaluates each
    `hook_fns[i]` on the outputs of every module whose dotted path
    fnmatch-es `hook_fn_locs[i]` (reference utils/model.py:86-106;
    paper https://arxiv.org/abs/2101.08692).

    Returns {hook_fn.__name__: [(module_path, value), ...]} ordered by
    module path.
    """
    import fnmatch as _fnmatch

    if len(hook_fn_locs) != len(hook_fns):
        raise ValueError(
            "Please provide `hook_fns` for each `hook_fn_locs`, "
            "their lengths are different."
        )
    _, state = model.apply(
        variables, inputs, capture_intermediates=True, mutable=["intermediates"],
        **apply_kwargs,
    )
    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(state["intermediates"])
    )
    stats = {fn.__name__: [] for fn in hook_fns}
    for path in sorted(flat):
        if path[-1] != "__call__":
            continue
        name = ".".join(path[:-1])
        outs = flat[path]
        out = outs[0] if isinstance(outs, (tuple, list)) else outs
        if not hasattr(out, "ndim"):
            continue  # modules returning pytrees are not SPP targets
        for loc, fn in zip(hook_fn_locs, hook_fns):
            if _fnmatch.fnmatch(name, loc):
                stats[fn.__name__].append((name, fn(out)))
    return stats
