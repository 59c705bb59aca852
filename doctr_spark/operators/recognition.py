"""Recognition kernels: CTC best-path decode, overlap string merge, wide-crop
split/remap, and the deterministic glyph recognizer for the synthetic raster
font.

Behavioral parity targets in the reference:
- ctc_best_path      : doctr/models/recognition/crnn/pytorch.py:55-81
                       (argmax path, collapse repeats via run-grouping, drop
                       blank = len(vocab); confidence = min over T of max
                       softmax prob)
- merge_strings      : doctr/models/recognition/utils.py:12-58 (min mean
                       Levenshtein suffix/prefix alignment; repetition edge
                       case bounded by geometric overlap)
- merge_multi_strings: doctr/models/recognition/utils.py:61-84 (left fold)
- split_crops/remap  : doctr/models/recognition/predictor/_utils.py:14-83

The glyph recognizer replaces the CRNN forward pass for the deterministic
OCR path: it segments a crop into glyph cells by blank columns and matches
each cell against the raster font table (sources/font.py). It plays the role
the tiny seeded models play in the reference's own unit tests — exact,
reproducible text so the per-turn equality oracle is well-defined.
"""

from __future__ import annotations

import numpy as np

from ..functions.vocabs import FONT, decode_sequence

# ---------------------------------------------------------------- levenshtein


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (insert/delete/substitute, unit costs)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, start=1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


# --------------------------------------------------------------- string merge


def merge_strings(a: str, b: str, dil_factor: float = 1.4) -> str:
    """Merge two overlapping character sequences.

    Chooses the overlap length minimizing mean edit distance between a's
    suffix and b's prefix; when the score list starts with two exact matches
    (a split inside a character repetition) the overlap is instead bounded by
    the geometric overlap implied by the crop dilation factor.
    """
    seq_len = min(len(a), len(b))
    if seq_len == 0:
        return a if b == "" else (b if a == "" else a + b)

    scores = [levenshtein(a[-i:], b[:i]) / i for i in range(1, seq_len + 1)]

    if len(scores) > 1 and scores[0] == 0 and scores[1] == 0:
        # repetition split: bound overlap by the geometric dilation overlap
        n_overlap = round(len(b) * (dil_factor - 1) / dil_factor)
        n_zeros = sum(1 for s in scores if s == 0)
        index = min(n_zeros, n_overlap)
    else:
        best, index = 1.0, 0
        for i, s in enumerate(scores):
            if s < best:
                best, index = s, i + 1

    if index == 0:
        return a + b
    return a[:-1] + b[index - 1 :]


def merge_multi_strings(seqs: list[str], dil_factor: float = 1.4) -> str:
    """Left-fold merge of consecutive overlapping sequences."""
    out = ""
    for s in seqs:
        out = merge_strings(out, s, dil_factor)
    return out


# ----------------------------------------------------------------- CTC decode


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - x.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def ctc_best_path(
    logits: np.ndarray, vocab: str = FONT, blank: int | None = None
) -> list[tuple[str, float]]:
    """Greedy CTC decode of (N, T, V+1) logits.

    Returns (word, confidence) with confidence = min over time of the max
    softmax probability (reference crnn/pytorch.py decode; identical conf
    rule in viptr/pytorch.py:51-68).

    ``blank`` defaults to ``len(vocab)`` (the CRNN convention, and what
    VIPTR's __call__ passes too — viptr/pytorch.py:78-90); a custom blank
    index is filtered from the collapsed path with the remaining class
    indices mapping straight into ``vocab``, exactly like the reference's
    parameterized ``ctc_best_path(…, blank=…)`` (viptr/pytorch.py:50-76).

    CONSTRAINT: when ``blank < len(vocab)``, the character ``vocab[blank]``
    becomes undecodable — blank is removed after collapse while every other
    index maps straight into ``vocab``, so that position must be a
    designated placeholder the model never emits as a real class
    (viptr_vocab reserves one; the reference has the same property).
    """
    arr = np.asarray(logits, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[None]
    if blank is None:
        blank = len(vocab)
    probs = softmax(arr, axis=-1).max(axis=-1).min(axis=-1)  # (N,)
    paths = arr.argmax(axis=-1)  # (N, T)
    out = []
    for path, conf in zip(paths, probs):
        collapsed: list[int] = []
        prev = -1
        for k in path.tolist():
            if k != prev:
                collapsed.append(k)
            prev = k
        seq = [k for k in collapsed if k != blank]
        out.append((decode_sequence(seq, vocab), float(conf)))
    return out


def indices_to_logits(indices: list[int], vocab: str = FONT, peak: float = 10.0) -> np.ndarray:
    """Build a (2n+1, V+1) logits sequence whose CTC best path decodes to the
    given char indices: blank / char / blank / char ... / blank. This is how
    the deterministic recognizer feeds the CTC decoder (the glyph matcher
    plays the CNN+BiLSTM feature extractor; CTC collapse stays real)."""
    blank = len(vocab)
    T = 2 * len(indices) + 1
    logits = np.zeros((T, blank + 1), dtype=np.float64)
    logits[:, blank] = peak  # default: blank
    for i, k in enumerate(indices):
        t = 2 * i + 1
        logits[t, blank] = 0.0
        logits[t, k] = peak
    return logits


# ------------------------------------------------------------ wide-crop split


def split_wide_crop(
    width: int,
    height: int,
    max_ratio: float = 8.0,
    target_ratio: int = 6,
    dilation: float = 1.4,
) -> list[tuple[int, int]] | None:
    """Column ranges [(start, stop), ...] chunking a too-wide crop into
    overlapping sub-crops, or None when no split is needed. Geometry matches
    the reference splitter (centers at (w/n)*(idx+1/2), width dil*w/n,
    right edge capped at w-1)."""
    ar = width / height
    if ar <= max_ratio:
        return None
    n = int(ar // target_ratio)
    sub_w = dilation * width / n
    ranges = []
    for idx in range(n):
        center = (width / n) * (0.5 + idx)
        start = max(0, int(round(center - sub_w / 2)))
        stop = min(width - 1, int(round(center + sub_w / 2)))
        if stop > start:
            ranges.append((start, stop))
    return ranges


def split_crops(
    crops: list[np.ndarray],
    max_ratio: float = 8.0,
    target_ratio: int = 6,
    dilation: float = 1.4,
) -> tuple[list[np.ndarray], list[int | tuple[int, int]], bool]:
    """Chunk wide crops; returns (new crops, mapping, remap_required)."""
    new_crops: list[np.ndarray] = []
    crop_map: list[int | tuple[int, int]] = []
    remap = False
    for crop in crops:
        h, w = crop.shape[:2]
        ranges = split_wide_crop(w, h, max_ratio, target_ratio, dilation) if h > 0 else None
        if ranges is None:
            crop_map.append(len(new_crops))
            new_crops.append(crop)
        else:
            pieces = [crop[:, s:e] for s, e in ranges]
            crop_map.append((len(new_crops), len(new_crops) + len(pieces)))
            new_crops.extend(pieces)
            remap = True
    return new_crops, crop_map, remap


def remap_preds(
    preds: list[tuple[str, float]],
    crop_map: list[int | tuple[int, int]],
    dilation: float = 1.4,
) -> list[tuple[str, float]]:
    """Re-merge predictions of split crops; confidence = min over pieces."""
    out: list[tuple[str, float]] = []
    for m in crop_map:
        if isinstance(m, int):
            out.append(preds[m])
        else:
            vals = [preds[i][0] for i in range(m[0], m[1])]
            confs = [preds[i][1] for i in range(m[0], m[1])]
            out.append((merge_multi_strings(vals, dilation), min(confs)))
    return out


def eos_decode(
    logits: np.ndarray, vocab: str = FONT, conf: str = "mean"
) -> list[tuple[str, float]]:
    """Parallel (non-CTC) sequence decode for attention/ViT-style heads:
    argmax per position over ``vocab + [<eos>, <sos>]``, word = everything
    before the first <eos>.

    ``conf`` selects the reference postprocessor family:
    - ``"mean"`` — ViTSTR semantics (reference
      recognition/vitstr/pytorch.py:155-180): mean of the per-position max
      softmax over the first ``len(word)`` positions, 0.0 for an empty
      word.
    - ``"min"`` — SAR semantics (reference recognition/sar/pytorch.py:
      309-333, shared by MASTER master/base.py:42): min of the argmax
      class's softmax over ALL positions, including <eos>/padding slots.

    The eos index is ``len(vocab)`` and sos is ``len(vocab) + 1``, matching
    the reference's ``encode_sequences(eos=len(vocab), sos=len(vocab)+1)``
    (vitstr/base.py:30-36). A predicted <sos> inside the word renders as
    the literal token string, exactly like the reference's embedding join.
    """
    arr = np.asarray(logits, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[None]
    embedding = list(vocab) + ["<eos>", "<sos>"]
    out_idxs = arr.argmax(axis=-1)  # (N, L)
    sm = softmax(arr, axis=-1)
    max_prob = sm.max(axis=-1)  # (N, L)
    out: list[tuple[str, float]] = []
    for i, seq in enumerate(out_idxs):
        word = "".join(embedding[k] for k in seq.tolist()).split("<eos>")[0]
        if conf == "mean":
            p = float(np.clip(max_prob[i, : len(word)], 0, 1).mean()) if word else 0.0
        elif conf == "min":
            p = float(np.clip(max_prob[i].min(), 0, 1))
        else:
            raise ValueError(f"unknown conf mode {conf!r}")
        out.append((word, p))
    return out


def indices_to_eos_logits(
    indices: list[int], vocab: str = FONT, max_length: int = 32, peak: float = 10.0
) -> np.ndarray:
    """Build a (max_length, V+2) parallel-decode logits sequence whose
    :func:`eos_decode` output is exactly the encoded word: one peaked row
    per character, then an <eos>-peaked row, then <eos>-peaked padding —
    the target layout the reference trains attention/ViT heads toward
    (``encode_sequences(..., eos=len(vocab))``, vitstr/base.py:30-36).
    The deterministic analog of :func:`indices_to_logits` for the non-CTC
    postprocessor family."""
    if len(indices) >= max_length:
        raise ValueError(f"word length {len(indices)} >= max_length {max_length}")
    v = len(vocab)
    logits = np.zeros((max_length, v + 2), dtype=np.float64)
    for t, k in enumerate(indices):
        logits[t, k] = peak
    logits[len(indices) :, v] = peak  # <eos> + padding slots
    return logits
