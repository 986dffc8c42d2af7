"""Data pipeline tests: folder scanning, consistent augs, grain loader."""

import os

import numpy as np
import pytest
from PIL import Image

from multimae_tpu.data.dataset_folder import ImageFolder, MultiTaskImageFolder
from multimae_tpu.data.loader import build_loader, steps_per_epoch
from multimae_tpu.data.pretrain_transforms import (
    DataAugmentationForMultiMAE,
    random_resized_crop_params,
)


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """root/{rgb,depth,semseg}/<class>/<name>.<ext> aligned trees."""
    root = tmp_path_factory.mktemp("multitask")
    rng = np.random.default_rng(0)
    for cls in ["class_a", "class_b"]:
        for i in range(4):
            name = f"img{i}"
            rgb_dir = root / "rgb" / cls
            depth_dir = root / "depth" / cls
            semseg_dir = root / "semseg" / cls
            for d in (rgb_dir, depth_dir, semseg_dir):
                d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (64, 80, 3), dtype=np.uint8), "RGB"
            ).save(rgb_dir / f"{name}.jpg")
            Image.fromarray(
                rng.integers(0, 2**16 - 1, (64, 80), dtype=np.uint16)
            ).save(depth_dir / f"{name}.png")
            seg = Image.fromarray(
                rng.integers(0, 10, (64, 80), dtype=np.uint8), "L"
            ).convert("P")
            seg.save(semseg_dir / f"{name}.png")
    return str(root)


def test_multitask_folder_scan(fake_dataset):
    ds = MultiTaskImageFolder(fake_dataset, ["rgb", "depth", "semseg"])
    assert len(ds) == 8
    assert ds.classes == ["class_a", "class_b"]
    sample, target = ds[0]
    assert set(sample.keys()) == {"rgb", "depth", "semseg"}
    assert sample["rgb"].mode == "RGB"
    assert sample["semseg"].mode == "P"
    assert target in (0, 1)


def test_max_images_fixed_subset(fake_dataset):
    ds1 = MultiTaskImageFolder(fake_dataset, ["rgb", "depth"], max_images=3)
    ds2 = MultiTaskImageFolder(fake_dataset, ["rgb", "depth"], max_images=3)
    assert len(ds1) == 3
    assert [s[0] for s in ds1.samples["rgb"]] == [s[0] for s in ds2.samples["rgb"]]
    # rgb/depth stay aligned after subsetting
    rgb_names = [os.path.basename(p) for p, _ in ds1.samples["rgb"]]
    depth_names = [os.path.basename(p) for p, _ in ds1.samples["depth"]]
    assert [n.split(".")[0] for n in rgb_names] == [
        n.split(".")[0] for n in depth_names
    ]


def test_transform_shapes_and_consistency(fake_dataset):
    ds = MultiTaskImageFolder(fake_dataset, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)
    sample, _ = ds[1]
    out = tf(sample)
    assert out["rgb"].shape == (32, 32, 3) and out["rgb"].dtype == np.float32
    assert out["depth"].shape == (32, 32, 1) and out["depth"].dtype == np.float32
    assert out["semseg"].shape == (8, 8) and out["semseg"].dtype == np.int32
    assert 0.0 <= out["depth"].min() and out["depth"].max() <= 1.0
    assert out["semseg"].min() >= 0 and out["semseg"].max() < 256


def test_crop_params_in_bounds():
    import random as pyrandom

    rng = pyrandom.Random(0)
    for _ in range(200):
        i, j, h, w = random_resized_crop_params(64, 80, rng=rng)
        assert 0 <= i and i + h <= 64
        assert 0 <= j and j + w <= 80
        assert h > 0 and w > 0


def test_grain_loader_batches(fake_dataset):
    ds = MultiTaskImageFolder(fake_dataset, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)
    it = build_loader(
        ds, tf, global_batch_size=4, shuffle=True, seed=0, num_epochs=1,
        worker_count=0,
    )
    batches = list(it)
    assert len(batches) == 2  # 8 samples / batch 4
    b = batches[0]
    assert b["rgb"].shape == (4, 32, 32, 3)
    assert b["depth"].shape == (4, 32, 32, 1)
    assert b["semseg"].shape == (4, 8, 8)
    assert b["label"].shape == (4,)
    assert steps_per_epoch(len(ds), 4) == 2


def test_loader_determinism(fake_dataset):
    ds = MultiTaskImageFolder(fake_dataset, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)
    b1 = next(build_loader(ds, tf, global_batch_size=4, seed=7, num_epochs=1,
                           worker_count=0))
    b2 = next(build_loader(ds, tf, global_batch_size=4, seed=7, num_epochs=1,
                           worker_count=0))
    np.testing.assert_array_equal(b1["rgb"], b2["rgb"])
    np.testing.assert_array_equal(b1["semseg"], b2["semseg"])


def test_single_imagefolder(fake_dataset):
    ds = ImageFolder(os.path.join(fake_dataset, "rgb"))
    assert len(ds) == 8
    img, target = ds[0]
    assert img.mode == "RGB"


def test_native_rgb_path_close_to_pil(fake_dataset):
    from multimae_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native fastimage unavailable")
    import random

    ds = MultiTaskImageFolder(fake_dataset, ["rgb", "depth", "semseg"])
    tf = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)
    sample, _ = ds[0]
    out_native = tf(dict(sample), rng=random.Random(3))
    tf_pil = DataAugmentationForMultiMAE(input_size=32, hflip=0.5)
    tf_pil._native_rgb = lambda *a, **k: None
    out_pil = tf_pil(dict(sample), rng=random.Random(3))
    # PIL uses 8-bit fixed-point resample coefficients; ours float
    assert np.abs(out_native["rgb"] - out_pil["rgb"]).mean() < 0.05
    np.testing.assert_array_equal(out_native["semseg"], out_pil["semseg"])
