"""TPU-friendly 2D interpolation with exact PyTorch `F.interpolate` numerics.

PyTorch semantics we reproduce (needed for bit-faithful checkpoint loading
and pos-emb interpolation; see reference multimae/input_adapters.py:113,
multimae/output_adapters.py:172, utils/pos_embed.py:44-58):

  * 'nearest'  : src = floor(dst * in/out)
  * 'bilinear' : align_corners=False -> src = (dst + 0.5) * in/out - 0.5
                 align_corners=True  -> src = dst * (in-1)/(out-1)
  * 'bicubic'  : cubic convolution kernel with a = -0.75 (PyTorch/OpenCV
                 convention; NOTE jax.image.resize uses a = -0.5, which is
                 why we do NOT use it), same src mapping as bilinear.
  * Out-of-range taps are clamped to the edge (replicate padding), without
    weight renormalisation — matching torch's implementation.

Instead of gathers, the resize is expressed as two small dense matmuls
(separable row/column weight matrices precomputed with numpy at trace
time). On TPU this maps onto the MXU and fuses with neighbouring ops.

Layout: NHWC (TPU-native). Input (..., H, W, C) -> output (..., OH, OW, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch uses a=-0.75."""
    t = np.abs(t)
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
        np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=None)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) float32 weight matrix W with out = W @ in."""
    W = np.zeros((out_size, in_size), dtype=np.float64)
    dst = np.arange(out_size, dtype=np.float64)

    if mode == "nearest":
        src = np.floor(dst * in_size / out_size).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        W[np.arange(out_size), src] = 1.0
        return W.astype(np.float32)

    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5

    if mode == "bilinear":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for tap, wgt in ((base, 1.0 - frac), (base + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), wgt)
        return W.astype(np.float32)

    if mode == "bicubic":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for off in (-1, 0, 1, 2):
            wgt = _cubic_kernel(frac - off)
            idx = np.clip(base + off, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), wgt)
        return W.astype(np.float32)

    raise ValueError(f"Unsupported interpolation mode: {mode}")


def interpolate_2d(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize the two spatial dims of an NHWC (or ...HWC) tensor.

    Matches torch.nn.functional.interpolate(x_nchw, size, mode,
    align_corners) up to float rounding. `size` must be static.
    """
    oh, ow = size
    ih, iw = x.shape[-3], x.shape[-2]
    if (ih, iw) == (oh, ow):
        return x
    dtype = x.dtype
    wh = jnp.asarray(_resize_matrix(ih, oh, mode, align_corners), dtype=jnp.float32)
    ww = jnp.asarray(_resize_matrix(iw, ow, mode, align_corners), dtype=jnp.float32)
    if dtype == jnp.bfloat16:
        # bf16 activations (in-model upsamples: DPT RefineNet/head,
        # ConvNeXt-head output, Segmenter masks) keep the single-pass
        # bf16 MXU path: the fp32-upcast + Precision.HIGHEST path below
        # costs 6 MXU passes and 2x the HBM traffic on tensors that only
        # carry 8 mantissa bits anyway (measured 18.5 ms/step of a 112 ms
        # depth@256 step, r5 profile). bf16 output directly: the MXU
        # accumulates fp32 regardless of output dtype, so this rounds
        # once at the output exactly like an fp32 result + astype would,
        # without materializing the fp32 intermediate (the convert pass
        # alone was 5.4 ms/step at taskonomy@384).
        out = jnp.einsum("ph,...hwc->...pwc", wh.astype(dtype), x)
        return jnp.einsum("qw,...pwc->...pqc", ww.astype(dtype), out)
    xf = x.astype(jnp.float32)
    # Full fp32 MXU precision: resize is parity-critical (pos-emb surgery,
    # fp32 golden paths), and these matrices are tiny compared to the
    # model matmuls.
    # rows: (..., H, W, C) -> (..., OH, W, C)
    xf = jnp.einsum("ph,...hwc->...pwc", wh, xf, precision=jax.lax.Precision.HIGHEST)
    # cols: (..., OH, W, C) -> (..., OH, OW, C)
    xf = jnp.einsum("qw,...pwc->...pqc", ww, xf, precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)


def interpolate_tokens_2d(
    tokens: jnp.ndarray,
    in_hw: tuple[int, int],
    out_hw: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize a (B, H*W, D) token grid to (B, OH*OW, D)."""
    b, n, d = tokens.shape
    ih, iw = in_hw
    assert n == ih * iw, f"token count {n} != {ih}x{iw}"
    x = tokens.reshape(b, ih, iw, d)
    x = interpolate_2d(x, out_hw, mode=mode, align_corners=align_corners)
    oh, ow = out_hw
    return x.reshape(b, oh * ow, d)
