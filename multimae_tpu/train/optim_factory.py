"""Optimizer factory: optax AdamW/Adam/SGD with reference param-grouping.

Reference semantics reproduced (utils/optim_factory.py):
  * no-decay group: 1-D params, biases, and the model's aggregated
    no_weight_decay() set (pos_emb / class_emb / mask_token /
    task_embeddings / global_tokens — multimae/multimae.py:130-146)
    -> weight decay 0 (:60-62)
  * layer-wise LR decay: adapters & tokens = layer 0, encoder block i =
    i+1, heads = last; per-group lr_scale = decay^(L+1-i) (:22-46,
    run_finetuning_cls.py:370-372)
  * pretrain dict-model path: NO bias/no-decay filtering — global weight
    decay on every trainable param, balancer group with its own lr scale
    (:138-150). We reproduce this quirk exactly for recipe parity.
  * frozen params (requires_grad=False in torch — our fixed sin-cos
    pos-embs) get identically-zero updates.

Implementation: per-leaf static `lr_scale` and `wd_flag` trees + two
small custom optax transforms, instead of optax.multi_transform — one
optimizer state, no masking overhead, trivially shardable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

NO_WD_LEAF_NAMES = ("pos_emb", "mask_token", "class_emb", "global_tokens", "cls_emb")


def default_no_decay(path: Tuple[str, ...], leaf) -> bool:
    """1-D params, biases, and the reference's no_weight_decay() set.

    Note: the reference Segmenter head has no no_weight_decay(), so its
    cls_emb DOES get weight decay there; we keep cls_emb in the skip set
    only via explicit skip_list to match — default excludes it.
    """
    name = path[-1]
    if np.ndim(leaf) <= 1 or name == "bias":
        return True
    if name in ("pos_emb", "mask_token", "global_tokens"):
        return True
    if name == "class_emb" and any(p.startswith("input_adapters_") for p in path):
        return True
    if any(p.startswith("task_embeddings_") for p in path):
        return True
    return False


def default_frozen(path: Tuple[str, ...], leaf, learnable_pos_emb: bool = False) -> bool:
    """Fixed sin-cos pos-embs (requires_grad=False in the reference)."""
    if learnable_pos_emb:
        return False
    return path[-1] == "pos_emb"


def get_num_layer_for_vit(path: Tuple[str, ...], num_values: int) -> int:
    """Reference utils/optim_factory.py:22-35, on flax paths."""
    top = path[0]
    if top in ("cls_token", "mask_token", "pos_embed", "global_tokens"):
        return 0
    if top.startswith("patch_embed") or top.startswith("input_adapters"):
        return 0
    if top.startswith("encoder_") or top.startswith("blocks_"):
        return int(top.split("_")[-1]) + 1
    return num_values - 1


class LayerDecayValueAssigner:
    """Reference utils/optim_factory.py:38-46."""

    def __init__(self, values: Sequence[float]):
        self.values = list(values)

    def get_scale(self, layer_id: int) -> float:
        return self.values[layer_id]

    def get_layer_id(self, path: Tuple[str, ...]) -> int:
        return get_num_layer_for_vit(path, len(self.values))


class _DecayState(NamedTuple):
    count: jnp.ndarray


def add_scheduled_decay(
    wd_schedule: Callable[[jnp.ndarray], jnp.ndarray], wd_flags: Any
) -> optax.GradientTransformation:
    """updates += wd(step) * flag * param (decoupled AdamW decay, applied
    before the LR scaling so the LR multiplies it — torch semantics)."""

    def init_fn(params):
        del params
        return _DecayState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        wd = wd_schedule(state.count)
        updates = jax.tree.map(
            lambda u, p, f: u + wd * f * p, updates, params, wd_flags
        )
        return updates, _DecayState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_schedule_per_leaf(
    lr_schedule: Callable[[jnp.ndarray], jnp.ndarray], lr_scales: Any
) -> optax.GradientTransformation:
    """updates *= -lr(step) * per-leaf scale."""

    def init_fn(params):
        del params
        return _DecayState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lr = lr_schedule(state.count)
        updates = jax.tree.map(lambda u, s: u * (-lr * s), updates, lr_scales)
        return updates, _DecayState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def build_param_labels(
    params: Any,
    *,
    layer_decay_assigner: Optional[LayerDecayValueAssigner] = None,
    skip_list: Optional[set] = None,
    no_decay_fn: Callable = default_no_decay,
    frozen_fn: Callable = default_frozen,
    filter_bias_and_bn: bool = True,
    balancer_lr_scale: float = 1.0,
    learnable_pos_emb: bool = False,
    verbose: bool = False,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Compute (lr_scales, wd_flags) static trees + a group report.

    Built with tree_map_with_path (NOT flatten/unflatten) so empty
    subtrees — e.g. a param-less NoWeighting balancer under
    {'model': ..., 'balancer': {}} — keep their place in the tree
    structure and jax.tree.map over (updates, params, flags) stays
    congruent.
    """
    from jax.tree_util import tree_map_with_path

    groups: Dict[str, list] = {}
    labels: Dict[Tuple[str, ...], Tuple[float, float]] = {}

    def compute(path_keys, leaf):
        path = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path_keys
        )
        name = ".".join(str(p) for p in path)
        if frozen_fn(path, leaf, learnable_pos_emb=learnable_pos_emb):
            groups.setdefault("frozen", []).append(name)
            return (0.0, 0.0)
        if path[0] == "balancer":
            groups.setdefault("balancer", []).append(name)
            return (balancer_lr_scale, 1.0 if not filter_bias_and_bn else 0.0)
        if not filter_bias_and_bn:
            # pretrain dict-model quirk: global wd, lr_scale 1
            groups.setdefault("flat_decay", []).append(name)
            return (1.0, 1.0)
        no_decay = (skip_list is not None and name in skip_list) or no_decay_fn(
            path, leaf
        )
        if layer_decay_assigner is not None:
            layer_id = layer_decay_assigner.get_layer_id(path)
            scale = layer_decay_assigner.get_scale(layer_id)
            gname = f"layer_{layer_id}_{'no_decay' if no_decay else 'decay'}"
        else:
            scale = 1.0
            gname = "no_decay" if no_decay else "decay"
        groups.setdefault(gname, []).append(name)
        return (float(scale), 0.0 if no_decay else 1.0)

    both = tree_map_with_path(compute, params)
    lr_scales = jax.tree.map(lambda t: t[0], both,
                             is_leaf=lambda x: isinstance(x, tuple))
    wd_flags = jax.tree.map(lambda t: t[1], both,
                            is_leaf=lambda x: isinstance(x, tuple))
    if verbose:
        for g, names in sorted(groups.items()):
            print(f"[optim] group {g}: {len(names)} params")
    return lr_scales, wd_flags, groups


def create_optimizer(
    params: Any,
    *,
    opt: str = "adamw",
    lr_schedule: Callable,
    weight_decay: float = 0.05,
    wd_schedule: Optional[Callable] = None,
    opt_betas: Tuple[float, float] = (0.9, 0.999),
    opt_eps: float = 1e-8,
    momentum: float = 0.9,
    layer_decay_assigner: Optional[LayerDecayValueAssigner] = None,
    skip_list: Optional[set] = None,
    filter_bias_and_bn: bool = True,
    balancer_lr_scale: float = 1.0,
    learnable_pos_emb: bool = False,
    verbose: bool = False,
) -> optax.GradientTransformation:
    """Build the optax transform chain mirroring utils/optim_factory.py:104-179."""
    lr_scales, wd_flags, _ = build_param_labels(
        params,
        layer_decay_assigner=layer_decay_assigner,
        skip_list=skip_list,
        filter_bias_and_bn=filter_bias_and_bn,
        balancer_lr_scale=balancer_lr_scale,
        learnable_pos_emb=learnable_pos_emb,
        verbose=verbose,
    )
    if wd_schedule is None:
        wd_schedule = lambda step: weight_decay  # noqa: E731

    opt = opt.lower().split("_")[-1]
    if opt in ("adamw",):
        core = optax.scale_by_adam(b1=opt_betas[0], b2=opt_betas[1], eps=opt_eps)
        decay = add_scheduled_decay(wd_schedule, wd_flags)
        chain = [core, decay]
    elif opt == "adam":
        core = optax.scale_by_adam(b1=opt_betas[0], b2=opt_betas[1], eps=opt_eps)
        # torch Adam applies L2 (coupled) wd to the gradient pre-adam; the
        # recipes never use adam+wd, so treat wd as decoupled-off here.
        chain = [core]
    elif opt in ("sgd", "nesterov", "momentum"):
        core = optax.trace(decay=momentum, nesterov=(opt != "momentum"))
        decay = add_scheduled_decay(wd_schedule, wd_flags)
        chain = [core, decay]
    else:
        raise ValueError(f"Invalid optimizer {opt}")

    chain.append(scale_by_schedule_per_leaf(lr_schedule, lr_scales))
    return optax.chain(*chain)
