"""Checkpoint save / auto-resume (reference: utils/checkpoint.py).

Format: one `checkpoint-{epoch}.msgpack` per save (flax serialization of
{params, opt_state, step, epoch, ema, batch_stats}), plus an `args.json`
sidecar — mirroring the reference's checkpoint-{epoch}.pth contents
(model/optimizer/epoch/scaler/args, utils/checkpoint.py:80-95). Only
process 0 writes (utils/dist.py:57-59).

`auto_load_checkpoint` globs the latest checkpoint-*.msgpack and restores
optimizer + epoch (utils/checkpoint.py:103-134). `load_pretrained_torch`
reads the released PyTorch .pth files through multimae_tpu.utils.
torch_compat for fine-tuning starts.
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
) -> Optional[str]:
    """Write checkpoint-{epoch}.msgpack (rank 0 only). Returns the path."""
    if not _is_main():
        return None
    os.makedirs(output_dir, exist_ok=True)
    to_sd = flax.serialization.to_state_dict
    payload = {
        "params": to_sd(jax.device_get(state.params)),
        "opt_state": to_sd(jax.device_get(state.opt_state)),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if state.ema_params is not None:
        payload["ema_params"] = to_sd(jax.device_get(state.ema_params))
    if state.batch_stats is not None:
        payload["batch_stats"] = to_sd(jax.device_get(state.batch_stats))
    if extras:
        payload["extras"] = to_sd(jax.device_get(extras))
    name = tag if tag is not None else f"checkpoint-{epoch}"
    path = os.path.join(output_dir, f"{name}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    if args is not None:
        with open(os.path.join(output_dir, "args.json"), "w") as f:
            json.dump({k: str(v) for k, v in args.items()}, f, indent=2)
    return path


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Glob latest checkpoint-*.msgpack (reference :107-117)."""
    ckpts = glob.glob(os.path.join(output_dir, "checkpoint-*.msgpack"))
    best, best_epoch = None, -1
    for c in ckpts:
        m = re.search(r"checkpoint-(\d+)\.msgpack$", c)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = c
    return best


def load_checkpoint(path: str, state, with_extras: bool = False):
    """Restore a TrainState (+epoch) from a saved msgpack.

    Returns (state, epoch) or (state, epoch, extras) with with_extras.
    """
    path = resolve_checkpoint_path(path)
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())

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
        opt_state=_restore(state.opt_state, payload["opt_state"]),
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
        return new_state, int(payload["epoch"]), payload.get("extras", {})
    return new_state, int(payload["epoch"])


def auto_load_checkpoint(output_dir: str, state, with_extras: bool = False):
    """Resume from the latest checkpoint in output_dir; returns
    (state, start_epoch[, extras]). start_epoch = saved epoch + 1
    (reference :131)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return (state, 0, {}) if with_extras else (state, 0)
    out = load_checkpoint(path, state, with_extras=with_extras)
    epoch = out[1]
    print(f"[checkpoint] auto-resumed from {path} (epoch {epoch})")
    if with_extras:
        return out[0], epoch + 1, out[2]
    return out[0], epoch + 1


def load_pretrained_torch(
    path: str, params_template, head_type: str = "regression", strict: bool = False
):
    """Load a reference-format .pth into a flax param template
    (fine-tune start; reference utils/checkpoint.py:26-72 tolerant load)."""
    from multimae_tpu.utils.torch_compat import (
        load_torch_state_dict,
        state_dict_to_params,
    )

    state_dict = load_torch_state_dict(resolve_checkpoint_path(path))
    return state_dict_to_params(
        state_dict, params_template, head_type=head_type, strict=strict
    )
