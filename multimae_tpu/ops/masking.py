"""Dirichlet task-sampled token masking, as a pure shape-static function.

Reimplements the sampling semantics of the reference
(multimae/multimae.py:148-218) as a pure function of a PRNG key so it can
live INSIDE the jitted train step (the reference runs it eagerly on GPU):

  1. Per-sample task proportions ~ Dirichlet(alphas); optionally the task
     subset is first drawn uniformly from the 2^n - 1 non-empty subsets
     (`sample_tasks_uniformly`, reference :148-162).
  2. Per task, `round(p_i * num_encoded_tokens)` tokens are kept at
     uniformly random positions (argsort-of-noise shuffle, :193-201).
  3. A global shuffle keyed on (mask, noise) picks exactly
     `num_encoded_tokens` visible tokens, correcting rounding (:203-216).

All shapes are static: B, the per-task token counts, and the number of
encoded tokens are Python ints; only values are traced.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp


def sample_alphas(
    key: jax.Array,
    batch: int,
    n_tasks: int,
    alphas: Union[float, Sequence[float]] = 1.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Uniformly choose a non-empty task subset per sample, scale by alphas.

    Reference: multimae/multimae.py:148-162.
    """
    choices = jnp.asarray(
        [list(c) for c in itertools.product([0, 1], repeat=n_tasks)][1:],
        dtype=jnp.float32,
    )
    idx = jax.random.randint(key, (batch,), 0, choices.shape[0])
    alphas_arr = jnp.asarray(
        [alphas] * n_tasks if isinstance(alphas, (int, float)) else list(alphas),
        dtype=jnp.float32,
    )
    return choices[idx] * alphas_arr + eps


def _gamma_mt(key: jax.Array, alpha: jnp.ndarray, n_rounds: int = 12) -> jnp.ndarray:
    """Loop-free Gamma(alpha) sampler (Marsaglia-Tsang squeeze, fixed fan-out).

    jax.random.gamma wraps its rejection sampler in a while_loop whose
    "all elements accepted" condition becomes a cross-device all-reduce
    PER ITERATION once the batch is sharded over a mesh — per-step ICI
    chatter on a pod, and a rendezvous deadlock on oversubscribed CPU
    hosts. This sampler instead draws `n_rounds` independent proposals
    per element up front (static shapes, no control flow) and takes the
    first accepted one. Acceptance per proposal is > 0.95, so all-reject
    probability is < 1e-15 at n_rounds=12; the mean draw is used as a
    numerical backstop in that event.

    Uses the alpha >= 1 form on (alpha + 1) with the U^(1/alpha) boost,
    which keeps one code path for every alpha > 0 (the boost underflows
    to 0 for the eps-sized concentrations `sample_alphas` assigns to
    excluded tasks, which is the intended "this task gets no tokens").
    """
    a = alpha.astype(jnp.float32) + 1.0
    d = a - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    k_n, k_u, k_b = jax.random.split(key, 3)
    shape = (n_rounds,) + alpha.shape
    tiny = jnp.finfo(jnp.float32).tiny
    x = jax.random.normal(k_n, shape, jnp.float32)
    u = jax.random.uniform(k_u, shape, jnp.float32, minval=tiny)
    w = 1.0 + c * x
    v = w * w * w
    ok = (w > 0.0) & (
        jnp.log(u)
        < 0.5 * x * x + d - d * v + d * jnp.log(jnp.where(w > 0.0, v, 1.0))
    )
    # Select the first accepted proposal without gathers: the cumulative
    # count equals 1 exactly at the first True.
    first = ok & (jnp.cumsum(ok.astype(jnp.int32), axis=0) == 1)
    v_sel = jnp.where(jnp.any(ok, axis=0), jnp.sum(jnp.where(first, v, 0.0), axis=0), 1.0)
    boost = jax.random.uniform(k_b, alpha.shape, jnp.float32, minval=tiny)
    return d * v_sel * jnp.exp(jnp.log(boost) / alpha)


def dirichlet_task_proportions(
    key: jax.Array,
    batch: int,
    n_tasks: int,
    alphas: Union[float, Sequence[float]] = 1.0,
    sample_tasks_uniformly: bool = False,
) -> jnp.ndarray:
    """(B, n_tasks) rows on the simplex.

    Loop-free by construction (see _gamma_mt): safe to shard over a data
    mesh with no collectives. The flat Dirichlet(1, ..., 1) of the
    default recipe is sampled exactly as normalized Exp(1) draws.
    """
    if sample_tasks_uniformly:
        k1, k2 = jax.random.split(key)
        alpha_mat = sample_alphas(k1, batch, n_tasks, alphas)
        # Dirichlet via normalized Gammas supports per-sample concentrations.
        gammas = _gamma_mt(k2, alpha_mat)
        return gammas / jnp.sum(gammas, axis=-1, keepdims=True)
    alphas_list = (
        [float(alphas)] * n_tasks
        if isinstance(alphas, (int, float))
        else [float(a) for a in alphas]
    )
    if all(a == 1.0 for a in alphas_list):
        e = jax.random.exponential(key, (batch, n_tasks), jnp.float32)
        return e / jnp.sum(e, axis=-1, keepdims=True)
    gammas = _gamma_mt(
        key, jnp.broadcast_to(jnp.asarray(alphas_list, jnp.float32), (batch, n_tasks))
    )
    return gammas / jnp.sum(gammas, axis=-1, keepdims=True)


def generate_random_masks(
    key: jax.Array,
    batch: int,
    num_tokens_per_task: Sequence[int],
    num_encoded_tokens: int,
    alphas: Union[float, Sequence[float]] = 1.0,
    sample_tasks_uniformly: bool = False,
) -> Tuple[List[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Sample visible-token ids across tasks.

    Returns:
      task_masks: list of (B, n_t) int32 masks per task; 0 = visible, 1 = masked.
      ids_keep:   (B, num_encoded_tokens) indices into the concatenated
                  token sequence (visible tokens).
      ids_restore:(B, N) inverse shuffle permutation.

    Reference: multimae/multimae.py:164-218.
    """
    n_tasks = len(num_tokens_per_task)
    total = int(sum(num_tokens_per_task))
    k_dir, k_shuffle, k_tie = jax.random.split(key, 3)

    props = dirichlet_task_proportions(
        k_dir, batch, n_tasks, alphas, sample_tasks_uniformly
    )
    samples_per_task = jnp.round(props * num_encoded_tokens).astype(jnp.int32)

    per_task_keys = jax.random.split(k_shuffle, n_tasks)
    task_masks = []
    for i, n_t in enumerate(num_tokens_per_task):
        noise = jax.random.uniform(per_task_keys[i], (batch, n_t))
        # argsort of noise is a uniform random permutation; positions whose
        # permuted rank value < samples_per_task are kept (reference :195-201).
        perm = jnp.argsort(noise, axis=1).astype(jnp.int32)
        mask = jnp.where(perm < samples_per_task[:, i : i + 1], 0, 1).astype(jnp.int32)
        task_masks.append(mask)

    mask_all = jnp.concatenate(task_masks, axis=1)
    tie_noise = jax.random.uniform(k_tie, (batch, total))
    ids_shuffle = jnp.argsort(mask_all.astype(jnp.float32) + tie_noise, axis=1).astype(
        jnp.int32
    )
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :num_encoded_tokens]

    # Correct the binary mask so exactly num_encoded_tokens are visible
    # (reference :209-216).
    ranks = ids_restore  # rank of each original position in the shuffle
    mask_all = jnp.where(ranks < num_encoded_tokens, 0, 1).astype(jnp.int32)
    out_masks = []
    start = 0
    for n_t in num_tokens_per_task:
        out_masks.append(mask_all[:, start : start + n_t])
        start += n_t
    return out_masks, ids_keep, ids_restore


def make_mask(
    n_h: int,
    n_w: int,
    xy_idxs: Dict[str, Sequence],
    full_tasks: Sequence[str] = (),
    indicate_visible: bool = True,
    flatten: bool = True,
):
    """Build per-task masks from lists of visible (x, y) patch coordinates.

    Reference: multimae/multimae.py:220-248 (demo / manual-mask path).
    Returns {task: (n_h, n_w) or (1, n_h*n_w)} int arrays; 0 = visible
    when indicate_visible (note the reference's flag has inverted naming:
    masks always use 0 = keep).
    """
    import numpy as np

    task_masks = {k: np.ones((n_h, n_w), np.int32) for k in xy_idxs.keys()}
    for k, coords in xy_idxs.items():
        coords = np.asarray(list(coords), np.int64).reshape(-1, 2)
        if len(coords):
            task_masks[k][coords[:, 1], coords[:, 0]] = 0
    for task in full_tasks:
        task_masks[task][:] = 0
    if not indicate_visible:
        task_masks = {k: 1 - v for k, v in task_masks.items()}
    if flatten:
        task_masks = {k: v.reshape(1, -1) for k, v in task_masks.items()}
    return {k: jnp.asarray(v) for k, v in task_masks.items()}


def masks_to_indices(
    task_masks: Dict[str, jnp.ndarray], num_encoded_tokens: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Derive (ids_keep, ids_restore) from user-supplied binary masks.

    The visible count must be static; callers pass `num_encoded_tokens`
    explicitly (the reference infers it from `(mask == 0).sum()`,
    multimae/multimae.py:334-338, which is data-dependent and thus not
    jittable — semantics are identical when the masks have exactly that
    many zeros).
    """
    mask_all = jnp.concatenate(list(task_masks.values()), axis=1)
    ids_shuffle = jnp.argsort(mask_all, axis=1, stable=True).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1, stable=True).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :num_encoded_tokens]
    return ids_keep, ids_restore
