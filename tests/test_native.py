"""Tests for the native fastimage library (libjpeg decode + fused resize)."""

import io

import numpy as np
import pytest
from PIL import Image

from multimae_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native fastimage unavailable (no g++/libjpeg)"
)


def _jpeg_bytes(h=200, w=300, quality=95):
    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 15, (h, w, 3))
    img = Image.fromarray(np.clip(x, 0, 255).astype(np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_decode_matches_pil():
    data = _jpeg_bytes()
    ours = native.decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)  # same libjpeg under the hood


def test_scaled_decode():
    data = _jpeg_bytes(400, 600)
    small = native.decode_jpeg(data, min_size=150)
    # 1/2 scale: short side 200 >= 150; 1/4 would be 100 < 150
    assert small.shape == (200, 300, 3)


def test_grayscale_jpeg():
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (64, 64), dtype=np.uint8), "L"
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    out = native.decode_jpeg(buf.getvalue())
    assert out.shape == (64, 64, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_crop_resize_normalize_close_to_pil():
    data = _jpeg_bytes(300, 400)
    src = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    crop = (17, 23, 200, 300)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)

    pil = Image.fromarray(src).crop(
        (crop[1], crop[0], crop[1] + crop[3], crop[0] + crop[2])
    ).resize((112, 112), Image.BICUBIC)
    ref = (np.asarray(pil, np.float32) / 255.0 - mean) / std

    ours = native.crop_resize_normalize(src, crop, (112, 112), mean, std,
                                        bicubic=True)
    # PIL uses 8-bit fixed-point filter coefficients; ours is float.
    assert np.abs(ours - ref).mean() < 0.02
    assert np.abs(ours - ref).max() < 0.3


def test_crop_resize_hflip():
    src = np.zeros((64, 64, 3), np.uint8)
    src[:, :32] = 255  # left half white
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = native.crop_resize_normalize(src, (0, 0, 64, 64), (32, 32), mean, std,
                                       bicubic=False, hflip=True)
    # flipped: right half should now be bright
    assert out[:, 24:].mean() > 0.9
    assert out[:, :8].mean() < 0.1


def test_crop_resize_u8_roundtrip():
    src = np.random.default_rng(2).integers(0, 255, (100, 120, 3), dtype=np.uint8)
    out = native.crop_resize_u8(src, (0, 0, 100, 120), (100, 120), bicubic=False)
    np.testing.assert_allclose(out, src, atol=1)  # identity resize


def test_bad_jpeg_returns_none():
    assert native.decode_jpeg(b"not a jpeg") is None


def _png_bytes(img: "Image.Image") -> bytes:
    import io

    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def test_decode_png_uint16_matches_pil():
    rng = np.random.default_rng(3)
    depth = rng.integers(0, 60000, (80, 96), dtype=np.uint16)
    data = _png_bytes(Image.fromarray(depth))
    arr = native.decode_png(data)
    assert arr is not None and arr.dtype == np.uint16
    np.testing.assert_array_equal(arr, np.asarray(Image.open(__import__("io").BytesIO(data))))
    np.testing.assert_array_equal(arr, depth)


def test_decode_png_palette_indices_match_pil():
    rng = np.random.default_rng(4)
    seg = rng.integers(0, 133, (64, 72), dtype=np.uint8)
    data = _png_bytes(Image.fromarray(seg, "L").convert("P"))
    arr = native.decode_png(data)
    assert arr is not None and arr.dtype == np.uint8
    ref = np.asarray(Image.open(__import__("io").BytesIO(data)).convert("P"))
    np.testing.assert_array_equal(arr, ref)


def test_decode_png_want_rgb():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    data = _png_bytes(Image.fromarray(rgb, "RGB"))
    arr = native.decode_png(data, want_rgb=True)
    assert arr is not None and arr.shape == (40, 50, 3)
    np.testing.assert_array_equal(arr, rgb)
    # gray and 16-bit promote to RGB8
    g16 = rng.integers(0, 60000, (20, 24), dtype=np.uint16)
    arr = native.decode_png(_png_bytes(Image.fromarray(g16)), want_rgb=True)
    assert arr is not None and arr.shape == (20, 24, 3) and arr.dtype == np.uint8


def test_decode_png_bad_bytes_returns_none():
    assert native.decode_png(b"not a png") is None


def test_pil_loader_png_native_path(tmp_path):
    from multimae_tpu.data.dataset_folder import pil_loader

    rng = np.random.default_rng(6)
    depth = rng.integers(0, 60000, (48, 56), dtype=np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(depth).save(p)
    img = pil_loader(str(p), convert_rgb=False)
    np.testing.assert_array_equal(np.asarray(img), depth)

    seg = rng.integers(0, 133, (32, 40), dtype=np.uint8)
    p2 = tmp_path / "s.png"
    Image.fromarray(seg, "L").convert("P").save(p2)
    img2 = pil_loader(str(p2), convert_rgb=False).convert("P")
    np.testing.assert_array_equal(np.asarray(img2), seg)
