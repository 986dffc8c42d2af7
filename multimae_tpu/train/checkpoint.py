"""Checkpoint save / auto-resume (reference: utils/checkpoint.py).

Two backends, selected per-call or via --ckpt_backend /
$MULTIMAE_TPU_CKPT_BACKEND:

- "msgpack" (default): one `checkpoint-{epoch}.msgpack` per save (flax
  serialization of {params, opt_state, step, epoch, ema, batch_stats}),
  plus an `args.json` sidecar — mirroring the reference's
  checkpoint-{epoch}.pth contents (model/optimizer/epoch/scaler/args,
  utils/checkpoint.py:80-95). Only process 0 writes (utils/dist.py:
  57-59) after a collective gather of any cross-process-sharded state.
- "orbax": `checkpoint-{epoch}.orbax/` via orbax StandardCheckpointer —
  each host writes its own shards directly (no gather, no full copy in
  host RAM), which is the TPU-pod-native path for large FSDP/TP states.
  Epoch lives in a `.meta.json` sidecar; extras in `.extras.msgpack`.

Either way, per-process extras (the grain iterator position — the
loader is process-sharded) go to per-rank `.proc{k}.msgpack` sidecars
and each rank restores its OWN copy on resume.

`auto_load_checkpoint` globs the latest checkpoint of either format and
restores optimizer + epoch (utils/checkpoint.py:103-134).
`load_pretrained_torch` reads the released PyTorch .pth files through
multimae_tpu.utils.torch_compat for fine-tuning starts.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def _is_main() -> bool:
    return jax.process_index() == 0


def default_backend() -> str:
    """Checkpoint backend when a call doesn't pass one explicitly."""
    return os.environ.get("MULTIMAE_TPU_CKPT_BACKEND", "msgpack")


def set_default_backend(name: str) -> None:
    """Wire --ckpt_backend through to every save/load in the process."""
    assert name in ("msgpack", "orbax"), name
    os.environ["MULTIMAE_TPU_CKPT_BACKEND"] = name


def _prune_empty(tree):
    """Drop empty dict subtrees (optax EmptyState etc.) — orbax rejects
    empty interior nodes; the restore merge treats their absence as
    'keep the template leaf', which is exactly right for stateless
    transforms."""
    if isinstance(tree, dict):
        out = {k: _prune_empty(v) for k, v in tree.items()}
        return {k: v for k, v in out.items()
                if not (isinstance(v, dict) and not v)}
    return tree


def _to_host(tree):
    """device_get that also works on cross-process sharded arrays.

    Under multi-host FSDP/TP the state's jax.Arrays are not fully
    addressable, so rank 0 alone cannot read them — every process joins
    a collective gather (process_allgather fully replicates the global
    value on each host) BEFORE the rank-0 write gate in save_checkpoint.
    Single-process / fully-addressable leaves take plain device_get.
    """
    from jax.experimental import multihost_utils

    def fix(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return jax.device_get(x)

    return jax.tree.map(fix, tree)


def resolve_checkpoint_path(path_or_url: str, cache_dir: Optional[str] = None) -> str:
    """Support URL checkpoints (reference utils/checkpoint.py:120-123).

    The reference routes https:// resume paths through
    torch.hub.load_state_dict_from_url, which downloads to a local cache
    and reuses it. Equivalent here: http(s):// paths are downloaded once
    to ~/.cache/multimae_tpu/checkpoints/<name> (override with cache_dir
    or $MULTIMAE_TPU_CKPT_CACHE) and the local path is returned. Plain
    filesystem paths pass through unchanged.
    """
    if not (path_or_url.startswith("https://") or path_or_url.startswith("http://")):
        return path_or_url
    import urllib.parse
    import urllib.request

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MULTIMAE_TPU_CKPT_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "multimae_tpu", "checkpoints"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    name = os.path.basename(urllib.parse.urlparse(path_or_url).path) or "checkpoint"
    local = os.path.join(cache_dir, name)
    if not os.path.exists(local):
        print(f"[checkpoint] downloading {path_or_url} -> {local}")
        tmp = local + ".tmp"
        urllib.request.urlretrieve(path_or_url, tmp)
        os.replace(tmp, local)
    return local


def save_checkpoint(
    output_dir: str,
    epoch: int,
    state,
    extras: Optional[Dict[str, Any]] = None,
    args: Optional[Dict[str, Any]] = None,
    tag: Optional[str] = None,
    backend: Optional[str] = None,
) -> Optional[str]:
    """Write checkpoint-{epoch}.{msgpack|orbax}. Rank 0 writes the
    msgpack (after a collective gather of any cross-process-sharded
    state); the orbax backend writes each host's shards directly. ALL
    processes must call either way. output_dir is assumed shared across
    hosts, as in the reference's rank-0 torch.save (utils/dist.py:
    57-59). Returns the path (None on non-main msgpack ranks)."""
    backend = backend or default_backend()
    to_sd = flax.serialization.to_state_dict
    name = tag if tag is not None else f"checkpoint-{epoch}"
    os.makedirs(output_dir, exist_ok=True)
    if extras and jax.process_count() > 1:
        # Host-local extras (the grain iterator position: the loader is
        # process-sharded via ShardOptions) differ per rank — each rank
        # writes its own sidecar; load_checkpoint prefers the matching
        # sidecar over the rank-0 copy embedded in the main payload.
        ppath = os.path.join(
            output_dir, f"{name}.proc{jax.process_index()}.msgpack")
        with open(ppath + ".tmp", "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                to_sd(jax.device_get(extras))))
        os.replace(ppath + ".tmp", ppath)
    if args is not None and _is_main():
        with open(os.path.join(output_dir, "args.json"), "w") as f:
            json.dump({k: str(v) for k, v in args.items()}, f, indent=2)

    if backend == "orbax":
        return _save_orbax(output_dir, name, epoch, state, extras)

    # msgpack: gather BEFORE the rank gate — see _to_host.
    payload = {
        "params": to_sd(_to_host(state.params)),
        "opt_state": to_sd(_to_host(state.opt_state)),
        "step": int(np.asarray(_to_host(state.step))),
        "epoch": int(epoch),
    }
    if state.ema_params is not None:
        payload["ema_params"] = to_sd(_to_host(state.ema_params))
    if state.batch_stats is not None:
        payload["batch_stats"] = to_sd(_to_host(state.batch_stats))
    if extras:
        payload["extras"] = to_sd(jax.device_get(extras))
    if not _is_main():
        return None
    path = os.path.join(output_dir, f"{name}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


_ASYNC_CKPTR = None


def _orbax_checkpointer():
    """(checkpointer, owns) — MULTIMAE_TPU_ORBAX_ASYNC=1 returns a
    process-wide AsyncCheckpointer: save() returns once the device->host
    copy is done (safe with donated train-state buffers) and the disk
    commit overlaps the next training steps; each save waits for the
    previous commit, and atexit drains the last one."""
    import orbax.checkpoint as ocp

    if os.environ.get("MULTIMAE_TPU_ORBAX_ASYNC") == "1":
        global _ASYNC_CKPTR
        if _ASYNC_CKPTR is None:
            import atexit

            _ASYNC_CKPTR = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
            atexit.register(_ASYNC_CKPTR.wait_until_finished)
        return _ASYNC_CKPTR, False
    return ocp.StandardCheckpointer(), True


def wait_for_checkpoints() -> None:
    """Drain any in-flight async orbax commit (no-op otherwise). The
    CLIs call this after the training loop so a checkpoint written on
    the last epoch is on disk before main() returns; atexit also drains
    as a backstop."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def _save_orbax(output_dir, name, epoch, state, extras) -> str:
    """Sharded save: every host writes its own device shards (orbax
    coordinates the atomic rename across processes) — no gather, no
    full-state host copy. The pod-native path for FSDP/TP states."""
    import orbax.checkpoint as ocp

    to_sd = flax.serialization.to_state_dict
    tree = {
        "params": to_sd(state.params),
        "opt_state": to_sd(state.opt_state),
        "step": state.step,
    }
    if state.ema_params is not None:
        tree["ema_params"] = to_sd(state.ema_params)
    if state.batch_stats is not None:
        tree["batch_stats"] = to_sd(state.batch_stats)
    tree = _prune_empty(tree)
    if jax.process_count() > 1:
        # Orbax refuses host-local arrays in multi-host mode (each host
        # holds its own copy, e.g. the step counter or host-replicated
        # leaves). Promote them to global fully-replicated arrays;
        # cross-process sharded leaves (FSDP/TP) pass through untouched.
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, PartitionSpec

        gmesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("_ckpt",))

        def globalize(x):
            if not isinstance(x, jax.Array):
                x = jnp.asarray(x)
            if x.is_fully_addressable:
                return multihost_utils.host_local_array_to_global_array(
                    x, gmesh, PartitionSpec())
            return x

        tree = jax.tree.map(globalize, tree)
    path = os.path.abspath(os.path.join(output_dir, f"{name}.orbax"))
    ckptr, owns = _orbax_checkpointer()
    try:
        if owns:  # StandardCheckpointer: takes the tree directly
            ckptr.save(path, tree, force=True)
            ckptr.wait_until_finished()
        else:  # AsyncCheckpointer over StandardCheckpointHandler
            ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
    finally:
        if owns:
            ckptr.close()
    if _is_main():
        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": int(epoch)}, f)
        if extras:
            epath = path + ".extras.msgpack"
            with open(epath + ".tmp", "wb") as f:
                f.write(flax.serialization.msgpack_serialize(
                    to_sd(jax.device_get(extras))))
            os.replace(epath + ".tmp", epath)
    return path


def checkpoint_candidates(output_dir: str) -> list:
    """All checkpoint-* paths of either backend, newest epoch first.

    Writers are crash-atomic (msgpack: write-to-.tmp + os.replace;
    orbax: temp-dir + commit rename, and its in-progress
    `*.orbax-checkpoint-tmp-*` names don't match the anchored pattern),
    but auto-resume runs exactly when something just died — a damaged
    save must cost one fallback, not the run. auto_load_checkpoint
    walks this list until one restores."""
    ckpts = glob.glob(os.path.join(output_dir, "checkpoint-*.msgpack"))
    ckpts += glob.glob(os.path.join(output_dir, "checkpoint-*.orbax"))
    out = []
    for c in ckpts:
        m = re.search(r"checkpoint-(\d+)\.(msgpack|orbax)$", c)
        if m:
            out.append((int(m.group(1)), c))
    return [c for _, c in sorted(out, reverse=True)]


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """The newest checkpoint-* of either backend (reference :107-117)."""
    cands = checkpoint_candidates(output_dir)
    return cands[0] if cands else None


def load_checkpoint(path: str, state, with_extras: bool = False):
    """Restore a TrainState (+epoch) from a saved msgpack.

    Returns (state, epoch) or (state, epoch, extras) with with_extras.

    `.pth` paths are reference-format torch checkpoints: params warm-start
    through torch_compat (the torch Adam moments have no optax layout
    here, so optimizer state restarts fresh) and the stored epoch is
    honored, mirroring the model/epoch part of the reference's resume
    (reference utils/checkpoint.py:103-134 auto_load_model).
    """
    path = resolve_checkpoint_path(path)
    if path.endswith(".pth"):
        from multimae_tpu.utils.torch_compat import (
            payload_to_state_dict,
            torch_load_checkpoint,
        )

        # Tolerant load: real reference training checkpoints embed an
        # argparse.Namespace under 'args' which plain weights_only=True
        # rejects (torch_compat.torch_load_checkpoint allow-lists it).
        payload = torch_load_checkpoint(path)
        epoch = int(payload.get("epoch", -1)) if isinstance(payload, dict) else -1
        template = state.params
        # Pretrain states nest the model under params["model"] next to
        # the balancer; fine-tune states are the bare model tree.
        nested = isinstance(template, dict) and "model" in template
        model_tpl = template["model"] if nested else template
        loaded, _ = load_pretrained_torch(
            path, model_tpl, state_dict=payload_to_state_dict(payload))
        params = {**template, "model": loaded} if nested else loaded
        print("[checkpoint] torch .pth resume: params + epoch restored; "
              "optimizer state restarts fresh")
        new_state = state.replace(params=params)
        if with_extras:
            return new_state, epoch, {}
        return new_state, epoch
    if path.endswith(".orbax") or os.path.isdir(path):
        payload = _orbax_restore_payload(path)
        stem = path[: -len(".orbax")] if path.endswith(".orbax") else path
    else:
        with open(path, "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        stem = path[: -len(".msgpack")]

    def _restore(template, saved):
        # Recursive template-preserving merge (NOT flatten/unflatten, which
        # drops empty subtrees such as a param-less NoWeighting balancer).
        sd = flax.serialization.to_state_dict(template)

        def merge(t, s):
            if isinstance(t, dict):
                return {
                    k: merge(v, s.get(k) if isinstance(s, dict) else None)
                    for k, v in t.items()
                }
            if s is None:
                return t
            return np.asarray(s).reshape(np.shape(t))

        return flax.serialization.from_state_dict(template, merge(sd, saved))

    new_state = state.replace(
        params=_restore(state.params, payload["params"]),
        # .get: a fully-stateless transform's opt_state prunes to
        # nothing in the orbax tree; the merge keeps the template.
        opt_state=_restore(state.opt_state, payload.get("opt_state")),
        step=np.asarray(payload["step"], np.int32),
    )
    if state.ema_params is not None and "ema_params" in payload:
        new_state = new_state.replace(
            ema_params=_restore(state.ema_params, payload["ema_params"])
        )
    if state.batch_stats is not None and "batch_stats" in payload:
        new_state = new_state.replace(
            batch_stats=_restore(state.batch_stats, payload["batch_stats"])
        )
    if with_extras:
        extras = payload.get("extras", {})
        # Multi-host: prefer this rank's own sidecar (per-process grain
        # iterator position) over the rank-0 copy in the main payload.
        pp = stem + f".proc{jax.process_index()}.msgpack"
        if os.path.exists(pp):
            with open(pp, "rb") as f:
                extras = flax.serialization.msgpack_restore(f.read())
        return new_state, int(payload["epoch"]), extras
    return new_state, int(payload["epoch"])


def _orbax_restore_payload(path: str) -> Dict[str, Any]:
    """Read an .orbax checkpoint back into the msgpack payload shape
    (numpy leaves on every host; the template-preserving merge in
    load_checkpoint re-shards from there).

    Restores every leaf as numpy explicitly: orbax's default restore
    rebuilds the SAVED shardings, which fails whenever the current
    topology differs from the saving one (fewer hosts, a different mesh
    — exactly the elasticity cases tests/test_checkpoint_elasticity.py
    and the 1-process-restore leg of tests/test_multiprocess.py pin).
    The reference's single .pth is topology-free by construction
    (utils/checkpoint.py:103-152); this keeps the orbax backend equally
    elastic. load_checkpoint's template merge re-shards afterwards."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        meta = ckptr.metadata(path)
        # orbax 0.11: StepMetadata.item_metadata.tree is the value tree;
        # keep a getattr chain so older metadata objects (a bare tree)
        # still work.
        inner = getattr(meta, "item_metadata", meta)
        meta_tree = getattr(inner, "tree", inner)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
        payload = dict(ckptr.restore(path, restore_args=restore_args))
    finally:
        ckptr.close()
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            payload["epoch"] = int(json.load(f)["epoch"])
    else:  # tag-saved without meta: fall back to the name
        m = re.search(r"checkpoint-(\d+)\.orbax$", path)
        payload["epoch"] = int(m.group(1)) if m else 0
    epath = path + ".extras.msgpack"
    if os.path.exists(epath):
        with open(epath, "rb") as f:
            payload["extras"] = flax.serialization.msgpack_restore(f.read())
    return payload


def auto_load_checkpoint(output_dir: str, state, with_extras: bool = False):
    """Resume from the latest LOADABLE checkpoint in output_dir; returns
    (state, start_epoch[, extras]). start_epoch = saved epoch + 1
    (reference :131).

    Crash-safe selection: auto-resume exists precisely for preemption
    (reference utils/checkpoint.py:107-117), so a damaged newest save —
    truncated file, interrupted async-orbax commit, half-copied dir —
    falls back to the previous epoch with a warning instead of crashing
    the relaunch. If EVERY candidate is damaged the last error is
    re-raised: silently training from scratch over a populated
    output_dir would destroy more than it saves.

    Multi-host runs coordinate the selection (process 0 picks, everyone
    follows): without the agreement step, a transient read error on one
    host would silently fall IT back to an older save while the others
    resume the newest — per-rank divergent states feeding the next
    gradient all-reduce."""
    cands = checkpoint_candidates(output_dir)
    if jax.process_count() > 1:
        return _auto_load_coordinated(output_dir, cands, state, with_extras)
    if not cands:
        return (state, 0, {}) if with_extras else (state, 0)
    last_err = None
    for i, path in enumerate(cands):
        try:
            out = load_checkpoint(path, state, with_extras=with_extras)
        except Exception as e:  # damaged save: fall back one epoch
            last_err = e
            print(f"[checkpoint] {path} failed to load ({type(e).__name__}: "
                  f"{e}); trying the previous checkpoint")
            continue
        epoch = out[1]
        note = " (skipped damaged newer saves)" if i else ""
        print(f"[checkpoint] auto-resumed from {path} (epoch {epoch}){note}")
        if with_extras:
            return out[0], epoch + 1, out[2]
        return out[0], epoch + 1
    raise RuntimeError(
        f"all {len(cands)} checkpoints in {output_dir} failed to load; "
        f"last error: {last_err}") from last_err


_BACKEND_EXTS = ("msgpack", "orbax")


def _validate_checkpoint_local(path: str) -> None:
    """Collective-free structural check that a save is complete; raises
    on damage. Used by the multi-host coordinated walk, where actually
    RESTORING on one rank would deadlock (orbax restore synchronizes all
    processes, and the other ranks are parked at the broadcast).

    msgpack: full parse of the file (local read, catches truncation).
    orbax: metadata read (barrier-free in orbax; catches missing/gutted
    dirs and a missing _METADATA — i.e. an uncommitted save)."""
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            flax.serialization.msgpack_restore(f.read())
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    try:
        ckptr.metadata(os.path.abspath(path))
    finally:
        ckptr.close()


def _auto_load_coordinated(output_dir, cands, state, with_extras):
    """Multi-host auto-resume with cross-process agreement.

    Process 0 walks the candidates newest-first validating each with
    LOCAL reads only, broadcasts its choice as (epoch, backend), then
    every process — including 0 — loads the agreed file together (so
    orbax's internal restore barriers line up). The filename is
    reconstructed from the broadcast pair (checkpoint names are exactly
    `checkpoint-{epoch}.{msgpack|orbax}`), so the decision does not
    depend on per-host directory-listing agreement. If the agreed file
    fails to load past validation, the error propagates — a consistent
    crash beats ranks silently resuming from different epochs.
    Sentinels: epoch -1 = no candidates (fresh start everywhere),
    -2 = every candidate damaged (raise everywhere)."""
    from jax.experimental import multihost_utils

    rank0 = jax.process_index() == 0
    choice, last_err = (-1, 0), None
    if rank0:
        for i, path in enumerate(cands):
            try:
                _validate_checkpoint_local(path)
            except Exception as e:  # damaged save: fall back one epoch
                last_err = e
                print(f"[checkpoint] {path} failed validation "
                      f"({type(e).__name__}: {e}); trying the previous "
                      f"checkpoint")
                continue
            m = re.search(r"checkpoint-(\d+)\.(msgpack|orbax)$", path)
            choice = (int(m.group(1)), _BACKEND_EXTS.index(m.group(2)))
            if i:
                print(f"[checkpoint] skipped {i} damaged newer save(s)")
            break
        else:
            if cands:
                choice = (-2, 0)
    msg = multihost_utils.broadcast_one_to_all(
        np.asarray(choice, np.int32))
    epoch, backend = int(msg[0]), int(msg[1])
    if epoch == -1:
        return (state, 0, {}) if with_extras else (state, 0)
    if epoch == -2:
        raise RuntimeError(
            f"all {len(cands) if rank0 else '(see process 0)'} checkpoints "
            f"in {output_dir} failed validation on process 0"
            + (f"; last error: {last_err}" if rank0 else ""))
    path = os.path.join(
        output_dir, f"checkpoint-{epoch}.{_BACKEND_EXTS[backend]}")
    # Deliberately no per-rank fallback past this point: the file
    # process 0 chose must load everywhere.
    out = load_checkpoint(path, state, with_extras=with_extras)
    print(f"[checkpoint] auto-resumed from {path} (epoch {out[1]}), "
          f"coordinated across {jax.process_count()} processes")
    if with_extras:
        return out[0], out[1] + 1, out[2]
    return out[0], out[1] + 1


def load_pretrained_torch(
    path: str, params_template, head_type: str = "regression",
    strict: bool = False, state_dict=None,
):
    """Load a reference-format .pth into a flax param template
    (fine-tune start; reference utils/checkpoint.py:26-72 tolerant load).

    Pass `state_dict` (flat {key: np.ndarray}) to reuse an
    already-deserialized payload instead of re-reading the file."""
    from multimae_tpu.utils.torch_compat import (
        load_torch_state_dict,
        state_dict_to_params,
    )

    if state_dict is None:
        state_dict = load_torch_state_dict(resolve_checkpoint_path(path))
    return state_dict_to_params(
        state_dict, params_template, head_type=head_type, strict=strict
    )
