"""RandAugment / AutoAugment-style policies (clean-room, PIL-based).

Behavioural parity with the timm stack the reference vendors
(utils/auto_augment.py): same op set, level math, and config-string
grammar for the recipes' `--aa rand-m9-mstd0.5-inc1`:
  * ops applied with prob 0.5 each, `num_layers` (default 2) draws with
    replacement from the op table
  * magnitude m in [0, 10]; with mstd > 0, m ~ N(magnitude, mstd) clipped
  * 'inc1' selects the "increasing" level maps (stronger effect with
    higher magnitude for Posterize/Solarize/Color/Contrast/Brightness/
    Sharpness)
  * geometric ops fill with the dataset mean colour and use a randomly
    chosen bilinear/bicubic resample
"""

from __future__ import annotations

import math
import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

from PIL import Image, ImageEnhance, ImageOps

_LEVEL_DENOM = 10.0
_DEFAULT_FILL = (128, 128, 128)


def _interp(resample):
    if isinstance(resample, (tuple, list)):
        return random.choice(resample)
    return resample


def _negate(v: float) -> float:
    return -v if random.random() > 0.5 else v


# --- pixel ops -------------------------------------------------------------

def auto_contrast(img, _):
    return ImageOps.autocontrast(img)


def equalize(img, _):
    return ImageOps.equalize(img)


def invert(img, _):
    return ImageOps.invert(img)


def rotate(img, degrees, fill=_DEFAULT_FILL, resample=None):
    return img.rotate(degrees, resample=_interp(resample), fillcolor=fill)


def posterize(img, bits):
    bits = int(bits)
    if bits >= 8:
        return img
    return ImageOps.posterize(img, max(bits, 1))


def solarize(img, thresh):
    return ImageOps.solarize(img, int(thresh))


def solarize_add(img, add, thresh: int = 128):
    lut = [min(255, i + int(add)) if i < thresh else i for i in range(256)]
    if img.mode in ("L", "RGB"):
        if img.mode == "RGB":
            lut = lut + lut + lut
        return img.point(lut)
    return img


def color(img, factor):
    return ImageEnhance.Color(img).enhance(factor)


def contrast(img, factor):
    return ImageEnhance.Contrast(img).enhance(factor)


def brightness(img, factor):
    return ImageEnhance.Brightness(img).enhance(factor)


def sharpness(img, factor):
    return ImageEnhance.Sharpness(img).enhance(factor)


def shear_x(img, factor, fill=_DEFAULT_FILL, resample=None):
    return img.transform(
        img.size, Image.AFFINE, (1, factor, 0, 0, 1, 0),
        resample=_interp(resample), fillcolor=fill,
    )


def shear_y(img, factor, fill=_DEFAULT_FILL, resample=None):
    return img.transform(
        img.size, Image.AFFINE, (1, 0, 0, factor, 1, 0),
        resample=_interp(resample), fillcolor=fill,
    )


def translate_x_rel(img, pct, fill=_DEFAULT_FILL, resample=None):
    pixels = pct * img.size[0]
    return img.transform(
        img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
        resample=_interp(resample), fillcolor=fill,
    )


def translate_y_rel(img, pct, fill=_DEFAULT_FILL, resample=None):
    pixels = pct * img.size[1]
    return img.transform(
        img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
        resample=_interp(resample), fillcolor=fill,
    )


# --- level maps ------------------------------------------------------------

def _enhance_level(m):
    return 1.8 * m / _LEVEL_DENOM + 0.1


def _enhance_increasing_level(m):
    return 1.0 + _negate(0.9 * m / _LEVEL_DENOM)


def _shear_level(m):
    return _negate(0.3 * m / _LEVEL_DENOM)


def _translate_rel_level(m):
    return _negate(0.45 * m / _LEVEL_DENOM)


def _rotate_level(m):
    return _negate(30.0 * m / _LEVEL_DENOM)


def _posterize_level(m):
    return int(4.0 * m / _LEVEL_DENOM)


_OPS = {
    # name: (fn, level_fn or None, geometric?)
    "AutoContrast": (auto_contrast, None, False),
    "Equalize": (equalize, None, False),
    "Invert": (invert, None, False),
    "Rotate": (rotate, _rotate_level, True),
    "Posterize": (posterize, lambda m: 4 - _posterize_level(m), False),
    "PosterizeIncreasing": (posterize, lambda m: 4 - _posterize_level(m), False),
    "PosterizeOriginal": (posterize, _posterize_level, False),
    "Solarize": (solarize, lambda m: 256 - int(256 * m / _LEVEL_DENOM), False),
    "SolarizeIncreasing": (
        solarize, lambda m: 256 - int(256 * m / _LEVEL_DENOM), False
    ),
    "SolarizeAdd": (solarize_add, lambda m: int(110 * m / _LEVEL_DENOM), False),
    "Color": (color, _enhance_level, False),
    "ColorIncreasing": (color, _enhance_increasing_level, False),
    "Contrast": (contrast, _enhance_level, False),
    "ContrastIncreasing": (contrast, _enhance_increasing_level, False),
    "Brightness": (brightness, _enhance_level, False),
    "BrightnessIncreasing": (brightness, _enhance_increasing_level, False),
    "Sharpness": (sharpness, _enhance_level, False),
    "SharpnessIncreasing": (sharpness, _enhance_increasing_level, False),
    "ShearX": (shear_x, _shear_level, True),
    "ShearY": (shear_y, _shear_level, True),
    "TranslateXRel": (translate_x_rel, _translate_rel_level, True),
    "TranslateYRel": (translate_y_rel, _translate_rel_level, True),
}

RAND_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel",
]

RAND_INCREASING_TRANSFORMS = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]


class AugmentOp:
    def __init__(self, name: str, prob: float = 0.5, magnitude: float = 10,
                 magnitude_std: float = 0.0, magnitude_max: Optional[float] = None,
                 fill: Tuple[int, int, int] = _DEFAULT_FILL):
        fn, level_fn, geometric = _OPS[name]
        self.name = name
        self.fn = fn
        self.level_fn = level_fn
        self.geometric = geometric
        self.prob = prob
        self.magnitude = magnitude
        self.magnitude_std = magnitude_std
        self.magnitude_max = magnitude_max
        self.fill = fill
        self.resample = (Image.BILINEAR, Image.BICUBIC)

    def __call__(self, img):
        if self.prob < 1.0 and random.random() > self.prob:
            return img
        m = self.magnitude
        if self.magnitude_std > 0:
            if self.magnitude_std == float("inf"):
                m = random.uniform(0, m)
            else:
                m = random.gauss(m, self.magnitude_std)
        upper = self.magnitude_max or _LEVEL_DENOM
        m = max(0.0, min(m, upper))
        if self.level_fn is None:
            return self.fn(img, None)
        level = self.level_fn(m)
        if self.geometric:
            return self.fn(img, level, fill=self.fill, resample=self.resample)
        return self.fn(img, level)


class RandAugment:
    def __init__(self, ops: Sequence[AugmentOp], num_layers: int = 2):
        self.ops = list(ops)
        self.num_layers = num_layers

    def __call__(self, img):
        for op in random.choices(self.ops, k=self.num_layers):
            img = op(img)
        return img


# --- AutoAugment (fixed policies from the AutoAugment paper / timm) -------

# Each sub-policy is two (op, prob, magnitude-level) stages; one sub-policy
# is drawn per image. 'v0' is the TF EfficientNet policy, 'original' the
# paper's ImageNet policy (Posterize interpreted "increasing", as in timm).

_POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

_POLICY_ORIGINAL = [
    [("PosterizeIncreasing", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeIncreasing", 0.6, 7), ("PosterizeIncreasing", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeIncreasing", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeIncreasing", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


class AutoAugment:
    def __init__(self, policy):
        self.policy = policy

    def __call__(self, img):
        sub_policy = random.choice(self.policy)
        for name, prob, magnitude in sub_policy:
            op = AugmentOp(name, prob=prob, magnitude=magnitude)
            img = op(img)
        return img


def auto_augment_transform(config_str: str, hparams: Optional[Dict] = None):
    """Parse 'original[-mstd0.5]' / 'v0' AutoAugment configs (timm grammar)."""
    hparams = dict(hparams or {})
    config = config_str.split("-")
    policy_name = config[0]
    # mstd etc. parsed but AutoAugment's fixed per-op magnitudes dominate.
    tables = {"original": _POLICY_ORIGINAL, "originalr": _POLICY_ORIGINAL,
              "v0": _POLICY_V0, "v0r": _POLICY_V0}
    if policy_name not in tables:
        raise ValueError(f"Unknown AutoAugment policy {policy_name}")
    fill = tuple(hparams.get("img_mean", _DEFAULT_FILL))
    policy = [
        [(name, prob, mag) for name, prob, mag in sub]
        for sub in tables[policy_name]
    ]
    aa = AutoAugment(policy)
    aa.fill = fill
    return aa


# --- AugMix (Hendrycks et al.) ---------------------------------------------

AUGMIX_TRANSFORMS = [
    "AutoContrast", "ColorIncreasing", "ContrastIncreasing",
    "BrightnessIncreasing", "SharpnessIncreasing", "Equalize", "Rotate",
    "PosterizeIncreasing", "SolarizeIncreasing", "ShearX", "ShearY",
    "TranslateXRel", "TranslateYRel",
]


class AugMixAugment:
    """width parallel augmentation chains, Dirichlet-mixed, then Beta-blended
    with the original image."""

    def __init__(self, ops: Sequence[AugmentOp], alpha: float = 1.0,
                 width: int = 3, depth: int = -1):
        self.ops = list(ops)
        self.alpha = alpha
        self.width = width
        self.depth = depth

    def __call__(self, img):
        import numpy as np

        ws = np.random.dirichlet([self.alpha] * self.width).astype(np.float32)
        m = float(np.random.beta(self.alpha, self.alpha))
        mixed = np.zeros((img.size[1], img.size[0], len(img.getbands())),
                         np.float32)
        for w in ws:
            depth = self.depth if self.depth > 0 else random.randint(1, 3)
            img_aug = img
            for op in random.choices(self.ops, k=depth):
                img_aug = op(img_aug)
            mixed += w * np.asarray(img_aug, np.float32)
        blended = m * np.asarray(img, np.float32) + (1.0 - m) * mixed
        return Image.fromarray(np.clip(blended, 0, 255).astype("uint8"),
                               img.mode)


def augmix_transform(config_str: str, hparams: Optional[Dict] = None):
    """Parse 'augmix-m3-w3[-d1][-mstd*]' configs (timm grammar)."""
    hparams = dict(hparams or {})
    magnitude, width, depth, alpha, mstd = 3.0, 3, -1, 1.0, float("inf")
    for c in config_str.split("-")[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            mstd = float(val)
        elif key == "m":
            magnitude = float(val)
        elif key == "w":
            width = int(val)
        elif key == "d":
            depth = int(val)
        elif key == "a":
            alpha = float(val)
    fill = tuple(hparams.get("img_mean", _DEFAULT_FILL))
    ops = [
        AugmentOp(n, prob=1.0, magnitude=magnitude, magnitude_std=mstd, fill=fill)
        for n in AUGMIX_TRANSFORMS
    ]
    return AugMixAugment(ops, alpha=alpha, width=width, depth=depth)


def create_aa_transform(config_str: str, hparams: Optional[Dict] = None):
    """Dispatch 'rand-*' -> RandAugment, 'augmix-*' -> AugMix, otherwise
    an AutoAugment policy (timm create_transform aa grammar)."""
    if config_str.startswith("rand"):
        return rand_augment_transform(config_str, hparams)
    if config_str.startswith("augmix"):
        return augmix_transform(config_str, hparams)
    return auto_augment_transform(config_str, hparams)


def rand_augment_transform(config_str: str, hparams: Optional[Dict] = None):
    """Parse 'rand-m9-mstd0.5-inc1'-style configs (timm grammar)."""
    hparams = dict(hparams or {})
    magnitude = _LEVEL_DENOM
    num_layers = 2
    increasing = False
    magnitude_std = 0.0
    magnitude_max = None
    config = config_str.split("-")
    assert config[0] == "rand", f"unsupported aa config {config_str}"
    for c in config[1:]:
        cs = re.split(r"(\d.*)", c)
        if len(cs) < 2:
            continue
        key, val = cs[:2]
        if key == "mstd":
            magnitude_std = float(val)
            if magnitude_std > 100:
                magnitude_std = float("inf")
        elif key == "mmax":
            magnitude_max = float(val)
        elif key == "inc":
            increasing = bool(int(val))
        elif key == "m":
            magnitude = float(val)
        elif key == "n":
            num_layers = int(val)
        elif key == "w":
            pass  # choice weights not used by any recipe here
        else:
            raise ValueError(f"Unknown RandAugment option {c}")
    names = RAND_INCREASING_TRANSFORMS if increasing else RAND_TRANSFORMS
    fill = tuple(hparams.get("img_mean", _DEFAULT_FILL))
    ops = [
        AugmentOp(n, prob=0.5, magnitude=magnitude, magnitude_std=magnitude_std,
                  magnitude_max=magnitude_max, fill=fill)
        for n in names
    ]
    return RandAugment(ops, num_layers=num_layers)
