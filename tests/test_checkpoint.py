"""Unit tests for train/checkpoint.py (single-process path).

The multi-host path (cross-process sharded state, per-rank extras
sidecars) is exercised by tests/test_multiprocess.py; the CLI resume
drives cover the end-to-end wiring. This file pins the plain API:
save -> latest -> auto-resume round-trip with optimizer state, EMA,
and extras. Reference semantics: utils/checkpoint.py:80-134.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimae_tpu.train.checkpoint import (
    auto_load_checkpoint,
    latest_checkpoint,
    save_checkpoint,
)
from multimae_tpu.train.train_state import TrainState


def _tiny_state(seed: int, ema: bool = False):
    k = jax.random.PRNGKey(seed)
    params = {
        "dense": {"kernel": jax.random.normal(k, (4, 3)), "bias": jnp.ones((3,))},
    }
    tx = optax.adamw(1e-3)
    return TrainState.create(params=params, tx=tx,
                             ema_decay=0.99 if ema else None)


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_save_and_auto_resume_roundtrip(tmp_path, backend):
    state = _tiny_state(0, ema=True)
    # take one real optimizer step so opt_state moments are nontrivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads, ema_decay=0.99)

    path = save_checkpoint(
        str(tmp_path), 3, state,
        extras={"data_iter_state": np.frombuffer(b"grain-pos", np.uint8)},
        args={"model": "tiny"},
        backend=backend,
    )
    assert path is not None and path.endswith(f"checkpoint-3.{backend}")
    assert latest_checkpoint(str(tmp_path)) == path
    assert (tmp_path / "args.json").exists()

    template = _tiny_state(1, ema=True)  # different values, same shapes
    restored, start_epoch, extras = auto_load_checkpoint(
        str(tmp_path), template, with_extras=True)
    assert start_epoch == 4  # saved epoch + 1 (reference :131)
    assert bytes(extras["data_iter_state"]) == b"grain-pos"
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.opt_state),
                    jax.tree.leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_auto_resume_empty_dir(tmp_path):
    state = _tiny_state(0)
    restored, start_epoch = auto_load_checkpoint(str(tmp_path), state)
    assert start_epoch == 0 and restored is state


def test_latest_picks_highest_epoch(tmp_path):
    state = _tiny_state(0)
    for ep in (1, 10, 2):
        save_checkpoint(str(tmp_path), ep, state)
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-10.msgpack")


def test_orbax_async_save(tmp_path, monkeypatch):
    """MULTIMAE_TPU_ORBAX_ASYNC=1: save returns early (post device->host
    copy), the commit lands in the background; a drained save must load
    back identically."""
    import multimae_tpu.train.checkpoint as ckpt_mod

    monkeypatch.setenv("MULTIMAE_TPU_ORBAX_ASYNC", "1")
    state = _tiny_state(0)
    save_checkpoint(str(tmp_path), 7, state, backend="orbax")
    assert ckpt_mod._ASYNC_CKPTR is not None
    ckpt_mod._ASYNC_CKPTR.wait_until_finished()
    from multimae_tpu.train.checkpoint import load_checkpoint

    restored, epoch = load_checkpoint(
        str(tmp_path / "checkpoint-7.orbax"), _tiny_state(1))
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_latest_spans_backends(tmp_path):
    state = _tiny_state(0)
    save_checkpoint(str(tmp_path), 1, state, backend="msgpack")
    save_checkpoint(str(tmp_path), 2, state, backend="orbax")
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-2.orbax")


# --- crash-safe selection (round-4 verdict item 3): auto-resume runs
# exactly when something just died, so a damaged newest save must cost
# one fallback, not the run. Reference behavior being hardened:
# utils/checkpoint.py:107-117 globs blindly and would torch.load garbage.


def _save_two_epochs(tmp_path, backend):
    state = _tiny_state(0, ema=True)
    grads = jax.tree.map(jnp.ones_like, state.params)
    state1 = state.apply_gradients(grads, ema_decay=0.99)
    save_checkpoint(str(tmp_path), 1, state1, backend=backend,
                    extras={"data_iter_state": np.frombuffer(b"pos1", np.uint8)})
    state2 = state1.apply_gradients(grads, ema_decay=0.99)
    save_checkpoint(str(tmp_path), 2, state2, backend=backend,
                    extras={"data_iter_state": np.frombuffer(b"pos2", np.uint8)})
    return state1, state2


def test_auto_resume_skips_truncated_msgpack(tmp_path):
    state1, _ = _save_two_epochs(tmp_path, "msgpack")
    p2 = tmp_path / "checkpoint-2.msgpack"
    data = p2.read_bytes()
    p2.write_bytes(data[: len(data) // 3])  # preemption mid-copy

    restored, start_epoch, extras = auto_load_checkpoint(
        str(tmp_path), _tiny_state(1, ema=True), with_extras=True)
    assert start_epoch == 2  # fell back to epoch 1
    assert bytes(extras["data_iter_state"]) == b"pos1"
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_auto_resume_skips_gutted_orbax(tmp_path):
    """An interrupted orbax commit (async committer killed mid-write on
    a non-atomic filesystem, or a half-rsynced dir) leaves a directory
    that matches the name pattern but fails to restore."""
    import shutil

    state1, _ = _save_two_epochs(tmp_path, "orbax")
    d2 = tmp_path / "checkpoint-2.orbax"
    for child in list(d2.iterdir()):  # gut the contents, keep the name
        shutil.rmtree(child) if child.is_dir() else child.unlink()

    restored, start_epoch = auto_load_checkpoint(
        str(tmp_path), _tiny_state(1, ema=True))
    assert start_epoch == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_latest_ignores_inflight_orbax_tmp(tmp_path):
    """orbax writes to `<name>.orbax.orbax-checkpoint-tmp-<ts>` and
    renames on commit; a crash mid-commit leaves the tmp dir, which must
    never be selected."""
    state = _tiny_state(0)
    save_checkpoint(str(tmp_path), 1, state, backend="orbax")
    (tmp_path / "checkpoint-9.orbax.orbax-checkpoint-tmp-12345").mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-1.orbax")


def test_auto_resume_all_damaged_raises(tmp_path):
    """Every candidate damaged: raise, don't silently train from scratch
    over a populated output_dir."""
    state = _tiny_state(0)
    save_checkpoint(str(tmp_path), 1, state, backend="msgpack")
    save_checkpoint(str(tmp_path), 2, state, backend="msgpack")
    for p in tmp_path.glob("checkpoint-*.msgpack"):
        p.write_bytes(b"\x00garbage")
    with pytest.raises(RuntimeError, match="failed to load"):
        auto_load_checkpoint(str(tmp_path), _tiny_state(1))
