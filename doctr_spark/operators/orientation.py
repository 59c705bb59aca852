"""Page/crop orientation operators (reference §2.4 semantics):

- rotate_page / rectify_crops: np.rot90 by quarter turns
  (doctr/models/_utils.py:117-133 rectify_crops rotates crops by the
  classifier's predicted orientation)
- rectify_loc_preds: np.roll of polygon point order
  (doctr/models/_utils.py:136-153)
- estimate_page_orientation: the deterministic stand-in for the
  MobileNetV3 0/90/180/270 classifier (classification/predictor): score
  each quarter turn by how many decoded glyphs hit the font table, pick
  the argmax (ties -> smallest k). Like the recognizer itself, this is a
  deterministic "model" so per-turn equality stays well-defined.

docTR's default pipeline (assume_straight_pages=True) skips orientation
entirely; ours does too — the pipeline enables this stage via
``detect_orientation=True``.
"""

from __future__ import annotations

import numpy as np

from ..functions.vocabs import UNKNOWN_CHAR
from ..sources.font import read_word_crop
from .detection import ink_word_boxes
from .geometry import extract_crops


def rotate_page(img: np.ndarray, k: int) -> np.ndarray:
    """Rotate by k quarter turns counter-clockwise."""
    return np.rot90(img, k % 4)


def rectify_crops(crops: list[np.ndarray], orientations: list[int]) -> list[np.ndarray]:
    """Rotate each crop back upright given its predicted orientation
    (k quarter turns to apply)."""
    return [np.rot90(c, k % 4) if k % 4 else c for c, k in zip(crops, orientations)]


def rectify_loc_preds(quads: np.ndarray, orientations: list[int]) -> np.ndarray:
    """Re-align polygon point order after crop rotation (np.roll on the
    point axis by the orientation index)."""
    q = np.asarray(quads, dtype=np.float64)
    out = q.copy()
    for i, k in enumerate(orientations):
        out[i] = np.roll(q[i], k % 4, axis=0)
    return out


def orientation_score(img: np.ndarray, scale: int, max_words: int = 6) -> float:
    """Fraction of decoded glyphs that hit the font table on up to
    ``max_words`` detected boxes (0.0 when nothing is detected)."""
    boxes = ink_word_boxes(img, scale)
    if boxes.shape[0] == 0:
        return 0.0
    crops = extract_crops(img, boxes[:max_words, :4])
    total = known = 0
    for c in crops:
        if c.size == 0:
            continue
        word = read_word_crop(c, scale)
        total += len(word)
        known += sum(1 for ch in word if ch != UNKNOWN_CHAR)
    return known / total if total else 0.0


def estimate_page_orientation(img: np.ndarray, scale: int, max_words: int = 6) -> int:
    """Number of quarter turns k such that rot90(img, k) is upright.
    Deterministic argmax of glyph-hit rate over the four orientations;
    ties resolve to the smallest k (0 wins on fully ambiguous pages)."""
    best_k, best_score = 0, -1.0
    for k in range(4):
        score = orientation_score(np.rot90(img, k), scale, max_words)
        if score > best_score:
            best_k, best_score = k, score
        if best_score == 1.0 and k == 0:
            break  # upright and fully readable: skip the other rotations
    return best_k
