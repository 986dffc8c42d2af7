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
