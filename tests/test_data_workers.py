"""Multi-worker grain loader tests (round-4 verdict item 1).

Production CLIs default to --num_workers > 0 (reference
run_pretraining_multimae.py:199 uses 10) and worker processes change real
behavior: the dataset/transform pickle into worker processes, per-record
RNG must not depend on which worker runs a record, the corrupt-file retry
must work inside a worker, and the grain iterator checkpoint
(train/checkpoint.py data_iter_state sidecars) must save/resume exactly
with workers running.

Batch COMPOSITION is worker-count-dependent by grain's design (records
are distributed round-robin to workers and batched inside each worker),
exactly like torch DataLoader prefetch order; what must hold — and what
these tests pin — is record-level determinism: the same epoch visits the
same records exactly once with bit-identical per-record augmentations
regardless of worker count. Measured throughput scaling lives in
PIPELINE.md (bench_data.py --workers).
"""

import numpy as np
import pytest
from PIL import Image

from multimae_tpu.data.dataset_folder import ImageFolder, MultiTaskImageFolder
from multimae_tpu.data.loader import build_loader
from multimae_tpu.data.pretrain_transforms import DataAugmentationForMultiMAE


def _make_tree(root, n_per_class=4, corrupt=()):
    """rgb jpg + depth uint16 png + semseg 'P' png aligned trees.
    `corrupt` lists (task, class, index) entries written as garbage."""
    rng = np.random.default_rng(0)
    for cls in ["class_a", "class_b"]:
        for i in range(n_per_class):
            name = f"img{i}"
            for task in ("rgb", "depth", "semseg"):
                d = root / task / cls
                d.mkdir(parents=True, exist_ok=True)
                path = d / (f"{name}.jpg" if task == "rgb" else f"{name}.png")
                if (task, cls, i) in corrupt:
                    path.write_bytes(b"not an image at all")
                    continue
                if task == "rgb":
                    Image.fromarray(
                        rng.integers(0, 255, (48, 56, 3), dtype=np.uint8), "RGB"
                    ).save(path)
                elif task == "depth":
                    Image.fromarray(
                        rng.integers(0, 2**16 - 1, (48, 56), dtype=np.uint16)
                    ).save(path)
                else:
                    Image.fromarray(
                        rng.integers(0, 10, (48, 56), dtype=np.uint8), "L"
                    ).convert("P").save(path)
    return str(root)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return _make_tree(tmp_path_factory.mktemp("workers"))


def _collect(it, n=None):
    if n is None:
        return list(it)
    return [next(it) for _ in range(n)]


def _samples_sorted(batches, sort_key):
    """Flatten batches into per-sample dicts, sorted by a content key so
    multisets compare positionally regardless of batch composition."""
    out = []
    for b in batches:
        n = len(b[sort_key])
        out.extend({k: v[i] for k, v in b.items()} for i in range(n))
    out.sort(key=lambda s: np.asarray(s[sort_key]).tobytes())
    return out


def _assert_same_samples(a, b, sort_key="rgb"):
    sa, sb = _samples_sorted(a, sort_key), _samples_sorted(b, sort_key)
    assert len(sa) == len(sb)
    for x, y in zip(sa, sb):
        assert set(x) == set(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)


def test_worker_epoch_matches_inprocess(tree):
    """A 2-worker multi-task epoch covers the same records exactly once
    with bit-identical per-record augmentations as the in-process loader
    on the same seed: the dataset/transform pickle faithfully into
    workers and the per-record RNG does not depend on worker placement.
    (Batch composition differs by design — grain batches inside each
    worker — so equality is at the sample multiset level.)"""
    ds = MultiTaskImageFolder(tree, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)

    def run(workers):
        return _collect(build_loader(
            ds, tf, global_batch_size=4, shuffle=True, seed=11,
            num_epochs=1, worker_count=workers,
        ))

    inproc = run(0)
    assert len(inproc) == 2  # 8 samples / batch 4
    workers = run(2)
    assert len(workers) == 2
    for b in workers:
        assert b["rgb"].shape == (4, 32, 32, 3)
        assert b["depth"].shape == (4, 32, 32, 1)
        assert b["semseg"].shape == (4, 8, 8)
    _assert_same_samples(workers, inproc)


def test_worker_epoch_matches_inprocess_imagefolder(tree):
    """Same for the cls-style single-modality path (ImageFolder +
    single-arg transform)."""
    import os

    ds = ImageFolder(os.path.join(tree, "rgb"))

    def tf(img):
        return np.asarray(img.resize((16, 16)), np.float32) / 255.0

    def run(workers):
        return _collect(build_loader(
            ds, tf, global_batch_size=4, shuffle=True, seed=5,
            num_epochs=1, worker_count=workers,
        ))

    _assert_same_samples(run(2), run(0), sort_key="image")


def test_corrupt_file_retry_inside_worker(tmp_path):
    """A corrupt file must resample (reference utils/dataset_folder.py:
    166-173) INSIDE the worker process instead of killing the epoch, and
    the resample draws from the per-record grain rng so the epoch is
    still deterministic per record — identical to in-process."""
    root = _make_tree(tmp_path, corrupt={("depth", "class_a", 1)})
    ds = MultiTaskImageFolder(root, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)

    def run(workers):
        return _collect(build_loader(
            ds, tf, global_batch_size=4, shuffle=True, seed=3,
            num_epochs=1, worker_count=workers,
        ))

    batches = run(2)
    assert len(batches) == 2
    for b in batches:
        assert b["rgb"].shape == (4, 32, 32, 3)
        assert np.isfinite(b["depth"]).all()
    _assert_same_samples(batches, run(0))


def test_iterator_save_resume_with_workers(tree):
    """get_state after k batches -> set_state on a FRESH multi-worker
    loader must continue the exact sequence (the data_iter_state extras
    path in train/checkpoint.py; goes beyond the reference, which
    restarts the epoch on resume)."""
    ds = MultiTaskImageFolder(tree, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)

    def make(workers):
        return build_loader(
            ds, tf, global_batch_size=4, shuffle=True, seed=9,
            num_epochs=None, worker_count=workers,
        )

    it = make(2)
    _collect(it, 3)  # cross the epoch boundary (2 batches/epoch)
    state = it.get_state()
    expected = _collect(it, 3)

    fresh = make(2)
    fresh.set_state(state)
    _assert_batches_equal(_collect(fresh, 3), expected)


def test_iterator_state_pins_worker_count(tree):
    """grain validates worker_count on restore: a checkpoint taken with
    --num_workers 2 does NOT restore onto a 0-worker loader (and vice
    versa). Pin the error so the supported matrix is explicit — the
    pretrain CLI catches it and falls back to a fresh shuffle with a
    warning (cli/run_pretraining_multimae.py data_iter_state restore)."""
    ds = MultiTaskImageFolder(tree, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)

    def make(workers):
        return build_loader(
            ds, tf, global_batch_size=4, shuffle=True, seed=13,
            num_epochs=None, worker_count=workers,
        )

    it = make(2)
    _collect(it, 1)
    state = it.get_state()
    fresh = make(0)
    with pytest.raises(ValueError, match="[Ww]orker count"):
        fresh.set_state(state)
