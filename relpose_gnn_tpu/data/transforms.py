"""Host-side image transforms for the input pipeline.

Matches the reference's torchvision transform stacks:
  * 7-Scenes:  Resize(256) + Normalize(per-scene stats mean, sqrt(var))
    (dataset_7Scenes_multi.py:293-298)
  * Cambridge: Resize(256) + ColorJitter(0.5, 0.5, 0.5, 0.2) +
    Normalize(0.5, 0.25) (dataset_Cambridge_multi.py:156-162)

Resize(256) = shortest side to 256 with aspect preserved, PIL bilinear
(antialiased) — exactly torchvision's PIL backend.  Normalization is kept
separable from decode so the packed dataset can store uint8 and normalize on
device (bandwidth win, SURVEY.md §7).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def resize_short_side(img: Image.Image, size: int = 256) -> Image.Image:
    """torchvision `Resize(int)` semantics: shorter side -> `size`."""
    w, h = img.size
    if h <= w:
        nh, nw = size, max(1, round(size * w / h))
    else:
        nw, nh = size, max(1, round(size * h / w))
    return img.resize((nw, nh), Image.BILINEAR)


def load_rgb(path: str) -> Image.Image | None:
    """PIL RGB load with IOError -> None (utils/utils.py:7-19 contract:
    callers skip-forward on corrupt images)."""
    try:
        img = Image.open(path)
        return img.convert("RGB")
    except (IOError, OSError):
        return None


def to_float_chw_free(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0, 1] (ToTensor without the CHW transpose —
    we keep NHWC for TPU)."""
    return np.asarray(img, np.float32) / 255.0


def normalize(x: np.ndarray, mean, std) -> np.ndarray:
    """[..., H, W, 3] in [0,1] -> normalized."""
    mean = np.asarray(mean, np.float32).reshape(1, 1, -1)
    std = np.asarray(std, np.float32).reshape(1, 1, -1)
    return (x - mean) / std


def color_jitter(rng: np.random.Generator, x: np.ndarray,
                 brightness: float = 0.5, contrast: float = 0.5,
                 saturation: float = 0.5, hue: float = 0.2) -> np.ndarray:
    """torchvision ColorJitter equivalent on float RGB [0,1] arrays.

    Factors drawn uniformly from [max(0, 1-a), 1+a] (hue from [-h, h]);
    operations applied in random order like torchvision.
    """
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda im: np.clip(im * f, 0, 1))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)

        def _contrast(im, f=f):
            gray = (0.299 * im[..., 0] + 0.587 * im[..., 1]
                    + 0.114 * im[..., 2]).mean()
            return np.clip((im - gray) * f + gray, 0, 1)
        ops.append(_contrast)
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)

        def _sat(im, f=f):
            gray = (0.299 * im[..., 0] + 0.587 * im[..., 1]
                    + 0.114 * im[..., 2])[..., None]
            return np.clip((im - gray) * f + gray, 0, 1)
        ops.append(_sat)
    if hue > 0:
        f = rng.uniform(-hue, hue)

        def _hue(im, f=f):
            # cheap hue rotation in YIQ space (equivalent rotation of the
            # chroma plane by 2*pi*f)
            y = 0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]
            i = (0.596 * im[..., 0] - 0.274 * im[..., 1]
                 - 0.322 * im[..., 2])
            q = (0.211 * im[..., 0] - 0.523 * im[..., 1]
                 + 0.312 * im[..., 2])
            ang = 2 * np.pi * f
            i2 = i * np.cos(ang) - q * np.sin(ang)
            q2 = i * np.sin(ang) + q * np.cos(ang)
            r = y + 0.956 * i2 + 0.621 * q2
            g = y - 0.272 * i2 - 0.647 * q2
            b = y - 1.106 * i2 + 1.703 * q2
            return np.clip(np.stack([r, g, b], -1), 0, 1)
        ops.append(_hue)
    order = rng.permutation(len(ops))
    for j in order:
        x = ops[j](x)
    return x


def load_and_preprocess(path: str, size: int = 256,
                        mean=None, std=None) -> np.ndarray | None:
    """Decode + resize (+optional normalize) one image -> [H, W, 3] f32."""
    img = load_rgb(path)
    if img is None:
        return None
    x = to_float_chw_free(resize_short_side(img, size))
    if mean is not None:
        x = normalize(x, mean, std)
    return x
