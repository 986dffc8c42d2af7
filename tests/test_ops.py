"""Parity tests for core ops against PyTorch reference semantics."""

import numpy as np
import pytest

from tests.conftest import requires_torch

from multimae_tpu.ops.posemb import build_2d_sincos_posemb
from multimae_tpu.ops.resize import interpolate_2d


@requires_torch
@pytest.mark.parametrize("h,w,dim", [(14, 14, 768), (7, 7, 256), (8, 12, 64)])
def test_sincos_posemb_matches_reference(h, w, dim):
    import torch
    from einops import rearrange

    # Reference computation (multimae/multimae_utils.py:29-45), re-executed
    # here rather than imported to keep the test self-contained.
    grid_w = torch.arange(w, dtype=torch.float32)
    grid_h = torch.arange(h, dtype=torch.float32)
    grid_w, grid_h = torch.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = dim // 4
    omega = torch.arange(pos_dim, dtype=torch.float32) / pos_dim
    omega = 1.0 / (10000.0**omega)
    out_w = torch.einsum("m,d->md", [grid_w.flatten(), omega])
    out_h = torch.einsum("m,d->md", [grid_h.flatten(), omega])
    ref = torch.cat(
        [torch.sin(out_w), torch.cos(out_w), torch.sin(out_h), torch.cos(out_h)],
        dim=1,
    )[None]
    ref = rearrange(ref, "b (h w) d -> b d h w", h=h, w=w, d=dim)
    ref_nhwc = ref.permute(0, 2, 3, 1).numpy()

    ours = build_2d_sincos_posemb(h, w, dim)
    np.testing.assert_allclose(ours, ref_nhwc, atol=1e-5, rtol=1e-5)


@requires_torch
@pytest.mark.parametrize(
    "mode,align_corners",
    [
        ("nearest", False),
        ("bilinear", False),
        ("bilinear", True),
        ("bicubic", False),
        ("bicubic", True),
    ],
)
@pytest.mark.parametrize("in_hw,out_hw", [((14, 14), (28, 28)), ((14, 14), (7, 7)),
                                          ((8, 8), (13, 17)), ((5, 9), (10, 6))])
def test_interpolate_matches_torch(mode, align_corners, in_hw, out_hw):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    ref = F.interpolate(x_t, size=out_hw, mode=mode, **kwargs)
    ref = ref.permute(0, 2, 3, 1).numpy()

    ours = np.asarray(interpolate_2d(x, out_hw, mode=mode, align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_interpolate_identity_is_noop():
    x = np.random.default_rng(1).standard_normal((1, 14, 14, 8)).astype(np.float32)
    out = np.asarray(interpolate_2d(x, (14, 14), mode="bicubic"))
    np.testing.assert_array_equal(out, x)


@pytest.mark.parametrize("mode,align_corners",
                         [("bilinear", True), ("bilinear", False),
                          ("bicubic", False), ("nearest", False)])
def test_interpolate_bf16_fast_path_tracks_fp32(mode, align_corners):
    """The bf16 single-pass MXU path (in-model DPT/ConvNeXt upsamples)
    must stay within bf16 rounding of the exact fp32/HIGHEST path and
    preserve the output dtype."""
    import jax.numpy as jnp

    x = np.random.default_rng(2).standard_normal((2, 16, 16, 32)).astype(np.float32)
    ref = np.asarray(interpolate_2d(jnp.asarray(x), (32, 32), mode=mode,
                                    align_corners=align_corners))
    out = interpolate_2d(jnp.asarray(x, jnp.bfloat16), (32, 32), mode=mode,
                         align_corners=align_corners)
    assert out.dtype == jnp.bfloat16
    scale = np.abs(ref).max()
    # two bf16 roundings (input + per-stage output) + bf16 weights
    assert np.abs(np.asarray(out, np.float32) - ref).max() <= 0.03 * scale
