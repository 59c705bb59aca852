"""Preprocessing kernels (reference §2.2-2.3 semantics, numpy-only):

- resize_page: fixed-size resize with optional aspect-ratio preservation +
  (symmetric) padding — the Resize transform
  (doctr/transforms/modules/pytorch.py:29-121) without torch: nearest-
  neighbor sampling, white padding for document pages.
- remove_padding: invert the aspect-ratio padding on relative box coords
  (doctr/models/detection/_utils/base.py:12-63 _remove_padding), both the
  symmetric and asymmetric cases.

These exist so models with fixed input sizes (the DBNet/CRNN contract:
1024x1024 det, 32x128 reco) can be slotted in; the deterministic ink model
is size-free and skips them by default.
"""

from __future__ import annotations

import numpy as np


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling)."""
    h, w = img.shape[:2]
    ys = np.clip(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), 0, h - 1)
    xs = np.clip(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), 0, w - 1)
    return img[np.ix_(ys, xs)] if img.ndim == 2 else img[np.ix_(ys, xs)]


def resize_page(
    img: np.ndarray,
    out_hw: tuple[int, int],
    preserve_aspect_ratio: bool = True,
    symmetric_pad: bool = True,
    pad_value: int = 255,
) -> tuple[np.ndarray, tuple[float, float, float, float]]:
    """Resize to (H,W). With preserve_aspect_ratio the content scales by a
    single factor and pads the short side (centered when symmetric_pad).

    Returns (resized, (offset_x, offset_y, scale_x, scale_y)) where the
    relative box transform is box' = offset + box * scale — the exact
    inverse remove_padding applies.
    """
    out_h, out_w = out_hw
    h, w = img.shape[:2]
    if not preserve_aspect_ratio:
        return resize_nearest(img, out_h, out_w), (0.0, 0.0, 1.0, 1.0)
    ratio = min(out_h / h, out_w / w)
    new_h, new_w = max(1, int(round(h * ratio))), max(1, int(round(w * ratio)))
    content = resize_nearest(img, new_h, new_w)
    canvas = np.full((out_h, out_w) + img.shape[2:], pad_value, dtype=img.dtype)
    if symmetric_pad:
        oy, ox = (out_h - new_h) // 2, (out_w - new_w) // 2
    else:
        oy, ox = 0, 0
    canvas[oy : oy + new_h, ox : ox + new_w] = content
    return canvas, (ox / out_w, oy / out_h, new_w / out_w, new_h / out_h)


def remove_padding(
    boxes: np.ndarray, transform: tuple[float, float, float, float]
) -> np.ndarray:
    """Invert resize_page's padding on relative (N,4) boxes detected on the
    padded canvas: box = (box' - offset) / scale, clipped to [0,1]."""
    ox, oy, sx, sy = transform
    b = np.asarray(boxes, dtype=np.float64).copy()
    b[:, [0, 2]] = (b[:, [0, 2]] - ox) / sx
    b[:, [1, 3]] = (b[:, [1, 3]] - oy) / sy
    return np.clip(b, 0.0, 1.0)


def normalize_batch(
    imgs: np.ndarray, mean: tuple[float, ...] = (0.5,), std: tuple[float, ...] = (1.0,)
) -> np.ndarray:
    """uint8 [0,255] -> float32 normalized batch (the PreProcessor cast+
    normalize contract, doctr/models/preprocessor/pytorch.py:21-124).
    Arrow batches are already 'the batch'; this is the per-batch math."""
    x = imgs.astype(np.float32) / 255.0
    mean_a = np.asarray(mean, dtype=np.float32)
    std_a = np.asarray(std, dtype=np.float32)
    return (x - mean_a) / std_a
