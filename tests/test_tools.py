"""Tests for checkpoint converters and taskonomy transforms."""

import numpy as np
import pytest

from tools.multimae2vit_converter import multimae_to_vit, multimae_to_vitmultimae
from tools.vit2multimae_converter import vit_to_multimae


def _fake_vit_sd(depth=2, dim=32, grid=4):
    rng = np.random.default_rng(0)
    sd = {
        "cls_token": rng.standard_normal((1, 1, dim)).astype(np.float32),
        "pos_embed": rng.standard_normal((1, grid * grid + 1, dim)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal((dim, 3, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal((dim,)).astype(np.float32),
    }
    for i in range(depth):
        sd[f"blocks.{i}.attn.qkv.weight"] = rng.standard_normal(
            (3 * dim, dim)
        ).astype(np.float32)
    return sd


def test_vit_to_multimae_keys():
    sd = _fake_vit_sd()
    out = vit_to_multimae(sd)
    assert "global_tokens" in out
    assert out["input_adapters.rgb.pos_emb"].shape == (1, 32, 4, 4)
    assert "input_adapters.rgb.proj.weight" in out
    assert "encoder.0.attn.qkv.weight" in out
    # cls pos-emb row folded into global token (reference :22-25)
    expected = sd["cls_token"][0, 0] + sd["pos_embed"][0, 0]
    np.testing.assert_allclose(out["global_tokens"][0, 0], expected, atol=1e-6)


def test_roundtrip_vit_multimae_vit():
    sd = _fake_vit_sd()
    mm = vit_to_multimae(sd)
    back = multimae_to_vit(mm)
    assert back["pos_embed"].shape == sd["pos_embed"].shape
    # grid part roundtrips exactly
    np.testing.assert_allclose(
        back["pos_embed"][:, 1:], sd["pos_embed"][:, 1:], atol=1e-6
    )
    np.testing.assert_array_equal(
        back["patch_embed.proj.weight"], sd["patch_embed.proj.weight"]
    )
    assert "blocks.0.attn.qkv.weight" in back


def test_multimae_to_vitmultimae_keeps_global_tokens():
    mm = vit_to_multimae(_fake_vit_sd())
    out = multimae_to_vitmultimae(mm)
    assert "global_tokens" in out
    assert out["pos_embed"].shape == (1, 16, 32)


def test_taskonomy_transforms():
    from PIL import Image

    from multimae_tpu.data.taskonomy import make_valid_mask, task_transform

    rng = np.random.default_rng(1)
    rgb = Image.fromarray(rng.integers(0, 255, (512, 512, 3), dtype=np.uint8), "RGB")
    out = task_transform(rgb, "rgb", image_size=64)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32

    depth = Image.fromarray(rng.integers(0, 9000, (512, 512), dtype=np.uint16))
    out = task_transform(depth, "depth_zbuffer", image_size=64)
    assert out.shape == (64, 64, 1)
    assert out.max() <= 1.0 and out.min() >= 0.0  # clamp + rescale

    edge = Image.fromarray(rng.integers(0, 2**16 - 1, (512, 512), dtype=np.uint16))
    out = task_transform(edge, "edge_occlusion", image_size=64)
    assert out.shape == (64, 64, 1)

    mask = np.ones((16, 16), np.float32)
    mask[4, 4] = 0.0
    valid = make_valid_mask(mask, max_pool_size=4)
    assert valid.shape == (16, 16)
    # the 4x4 block containing the hole is invalidated
    assert not valid[4:8, 4:8].any()
    assert valid[0:4, 0:4].all()
