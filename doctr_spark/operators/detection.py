"""Text-detection kernels: a DB-style postprocessor in pure numpy and a
deterministic "detector model" for the synthetic raster pages.

Behavioral parity targets in the reference:
- postprocess contract: binarize proba map at bin_thresh, 3x3 morphological
  opening, connected components, min-size filter, objectness = mean proba
  over the component bbox, score filter at box_thresh, unclip expansion by
  distance = area*unclip_ratio/perimeter, relative [0,1] output (N,5)
  (doctr/models/detection/core.py:33-95 and
   differentiable_binarization/base.py:41-152; defaults bin_thresh=0.3,
   box_thresh=0.1, unclip_ratio=1.5).
- The neural forward pass (DBNet) is replaced by ``ink_proba_map``: a
  deterministic proba map derived from the rendered page (ink mask dilated
  horizontally so intra-word char gaps fuse while inter-word gaps stay
  open). This mirrors how the reference's own unit tests drive the
  postprocessor with synthetic maps (tests/common/test_models_detection.py).

Everything is vectorized numpy; connected components use run-length
union-find (no per-pixel Python loops).
"""

from __future__ import annotations

import numpy as np

BIN_THRESH = 0.3
BOX_THRESH = 0.1
# ink-fuse dilation radii in CELLS (word-gap bridge / line-band expansion).
# Single source of truth: ink_word_boxes' fuse steps AND the cell-space
# fast path's edge guards both derive from these — change them here only.
H_DILATE_CELLS = 3
V_DILATE_CELLS = 4
UNCLIP_RATIO = 1.5
MIN_SIZE_BOX = 2

# postprocessor presets per detector family (reference defaults: DB at
# bin .3/box .1/unclip 1.5; FAST and LinkNet at bin .1/box .1/unclip 1.0
# — same postprocess contract, different thresholds)
DB_POSTPROC = {"bin_thresh": 0.3, "box_thresh": 0.1, "unclip_ratio": 1.5}
FAST_POSTPROC = {"bin_thresh": 0.1, "box_thresh": 0.1, "unclip_ratio": 1.0}
LINKNET_POSTPROC = {"bin_thresh": 0.1, "box_thresh": 0.1, "unclip_ratio": 1.0}


# ------------------------------------------------------------- morphology


def _window_count(m: np.ndarray, radius: int, axis: int) -> np.ndarray:
    """Sliding-window sum of width 2*radius+1 along an axis (zero-padded),
    via cumsum — two passes regardless of radius (memory-bandwidth-friendly;
    these maps are the hot loop of the extraction UDF)."""
    n = m.shape[axis]
    pad_widths = [(0, 0), (0, 0)]
    pad_widths[axis] = (radius + 1, radius)
    # int16 suffices (window counts are bounded by the axis length, pages
    # are < 32k px) and halves the memory traffic of the hot loop
    c = np.cumsum(np.pad(m, pad_widths, mode="constant"), axis=axis, dtype=np.int16)
    hi = np.take(c, np.arange(2 * radius + 1, 2 * radius + 1 + n), axis=axis)
    lo = np.take(c, np.arange(0, n), axis=axis)
    return hi - lo


def _dilate_axis(m: np.ndarray, radius: int, axis: int) -> np.ndarray:
    return (_window_count(m.astype(np.uint8), radius, axis) > 0).astype(np.uint8)


def _erode_axis(m: np.ndarray, radius: int, axis: int) -> np.ndarray:
    return (_window_count(m.astype(np.uint8), radius, axis) == 2 * radius + 1).astype(np.uint8)


def binary_open3(m: np.ndarray) -> np.ndarray:
    """3x3 opening (erosion then dilation) — despeckles the bitmap exactly
    like the reference's cv2.MORPH_OPEN with a 3x3 kernel. Separable:
    erode rows+cols, then dilate rows+cols."""
    e = _erode_axis(_erode_axis(m.astype(np.uint8), 1, 0), 1, 1)
    return _dilate_axis(_dilate_axis(e, 1, 0), 1, 1)


def dilate_horizontal(m: np.ndarray, radius: int) -> np.ndarray:
    """Horizontal dilation by ``radius`` px each side (fuses char gaps)."""
    return _dilate_axis(m, radius, 1)


def dilate_vertical(m: np.ndarray, radius: int) -> np.ndarray:
    """Vertical dilation by ``radius`` px each side."""
    return _dilate_axis(m, radius, 0)


# ------------------------------------------------- connected components


def connected_components(bitmap: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected components of a 0/1 bitmap via row-run union-find.

    Returns component bboxes as (xmin, ymin, xmax, ymax) *inclusive* pixel
    coords, in raster order of their topmost-leftmost run (deterministic).
    """
    h, w = bitmap.shape
    b = bitmap.astype(bool)
    # all runs at once: pad each row with zeros, diff over the flat array —
    # run starts/stops never cross row boundaries (vectorized, no row loop)
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = b
    d = np.diff(padded.reshape(-1))
    flat_starts = np.flatnonzero(d == 1) + 1
    flat_stops = np.flatnonzero(d == -1) + 1
    rows = flat_starts // (w + 2)
    starts = flat_starts % (w + 2) - 1
    stops = flat_stops % (w + 2) - 1
    n = len(rows)
    if n == 0:
        return []
    counts = np.bincount(rows, minlength=h)
    offsets = np.concatenate(([0], np.cumsum(counts)))

    # --- edges between overlapping runs of consecutive rows, vectorized
    # over the whole page at once. Runs are globally sorted by (row, start)
    # and within-row disjoint, so composite keys row*(w+2)+coord are sorted
    # ascending for both starts and stops; for each run j (row y, span
    # [s,e)) the overlap candidates in row y-1 form the contiguous global
    # index range [first run with stop >= s, last run with start <= e)
    # clamped to row y-1's slice (one-pixel slack => 8-connectivity).
    span = w + 2
    ps_key = rows * span + starts
    pe_key = rows * span + stops
    prev_key = (rows - 1) * span
    lo = np.searchsorted(pe_key, prev_key + starts - 1, side="right")
    hi = np.searchsorted(ps_key, prev_key + stops, side="right")
    lo = np.maximum(lo, offsets[np.maximum(rows - 1, 0)])
    hi = np.minimum(hi, offsets[rows])
    m = np.maximum(hi - lo, 0)
    m[rows == 0] = 0
    total = int(m.sum())
    if total:
        v = np.repeat(np.arange(n), m)
        # ragged arange: concatenate(arange(lo_j, hi_j) for all j), no loop
        keep = m > 0
        lk, mk = lo[keep], m[keep]
        steps = np.ones(total, dtype=np.int64)
        heads = np.concatenate(([0], np.cumsum(mk)[:-1]))
        steps[heads] = lk - np.concatenate(([0], lk[:-1] + mk[:-1] - 1))
        u = np.cumsum(steps)
    else:
        u = v = np.empty(0, dtype=np.int64)

    # --- min-label propagation with pointer jumping: converges to label =
    # min run index of the component — the same root the old min-root
    # union-find produced, so output order is unchanged
    labels = np.arange(n)
    while True:
        prev = labels
        if len(u):
            m2 = np.minimum(labels[u], labels[v])
            labels = labels.copy()
            np.minimum.at(labels, u, m2)
            np.minimum.at(labels, v, m2)
        labels = np.minimum(labels, labels[labels])
        if np.array_equal(labels, prev):
            break

    # --- per-component bbox (inclusive), in raster order of the root run
    roots, inv = np.unique(labels, return_inverse=True)
    k = len(roots)
    xmin = np.full(k, w, dtype=np.int64)
    xmax = np.full(k, -1, dtype=np.int64)
    ymin = np.full(k, h, dtype=np.int64)
    ymax = np.full(k, -1, dtype=np.int64)
    np.minimum.at(xmin, inv, starts)
    np.maximum.at(xmax, inv, stops - 1)
    np.minimum.at(ymin, inv, rows)
    np.maximum.at(ymax, inv, rows)
    return list(zip(xmin.tolist(), ymin.tolist(), xmax.tolist(), ymax.tolist()))


# ------------------------------------------------------------ postprocess


def box_score(pred: np.ndarray, xmin: int, ymin: int, xmax: int, ymax: int) -> float:
    """Mean proba over the inclusive bbox region (objectness)."""
    h, w = pred.shape[:2]
    x0 = int(np.clip(xmin, 0, w - 1))
    x1 = int(np.clip(xmax, 0, w - 1))
    y0 = int(np.clip(ymin, 0, h - 1))
    y1 = int(np.clip(ymax, 0, h - 1))
    return float(pred[y0 : y1 + 1, x0 : x1 + 1].mean())


def unclip_box(xmin: int, ymin: int, xmax: int, ymax: int, unclip_ratio: float = UNCLIP_RATIO) -> tuple[int, int, int, int]:
    """Expand an inclusive pixel bbox by the DB unclip distance
    d = area*ratio/perimeter, with outward integer rounding (floor mins,
    ceil maxes) — the analytic equivalent of a round-joint polygon offset
    followed by a bounding rect, for axis-aligned components."""
    bw = xmax - xmin + 1
    bh = ymax - ymin + 1
    d = (bw * bh) * unclip_ratio / (2.0 * (bw + bh))
    return (
        int(np.floor(xmin - d)),
        int(np.floor(ymin - d)),
        int(np.ceil(xmax + d)),
        int(np.ceil(ymax + d)),
    )


def bitmap_to_boxes(
    pred: np.ndarray,
    bitmap: np.ndarray,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
    min_size_box: int = MIN_SIZE_BOX,
    score_mask: np.ndarray | None = None,
    levels: tuple[float, float] | None = None,
    cell_scale: int = 1,
    out_dims: tuple[int, int] | None = None,
) -> np.ndarray:
    """Connected components of the (already opened) bitmap -> (N,5) relative
    [xmin,ymin,xmax,ymax,score] boxes, clipped to [0,1].

    Fast path: when the proba map is two-level (bg where mask=0, fg where
    mask=1), pass ``score_mask``+``levels`` instead of ``pred`` — the score
    bg + (fg-bg)*mean(mask[region]) is then exactly the proba mean without
    ever materializing a float map (the hot loop of the extraction UDF).

    ``cell_scale`` > 1: the bitmap is a cell-space downsampling of a pixel
    mask (each cell = a ``cell_scale`` x ``cell_scale`` pixel block);
    component bboxes convert to pixel coords before the size filter /
    unclip / normalization, which use ``out_dims`` (the true pixel page
    dims — may be up to cell_scale-1 px larger than bitmap*cell_scale).
    Scores still come from the cell mask: for a cell-aligned mask the ink
    fraction over any cell-aligned region is identical in both spaces."""
    h, w = (out_dims if out_dims is not None else bitmap.shape[:2])
    cs = cell_scale
    out: list[list[float]] = []
    for cx0, cy0, cx1, cy1 in connected_components(bitmap):
        if cs > 1:
            x0, y0, x1, y1 = cx0 * cs, cy0 * cs, (cx1 + 1) * cs - 1, (cy1 + 1) * cs - 1
        else:
            x0, y0, x1, y1 = cx0, cy0, cx1, cy1
        # extent filter mirrors the reference's contour-extent < min_size drop
        if (x1 - x0) < min_size_box or (y1 - y0) < min_size_box:
            continue
        if score_mask is not None and levels is not None:
            bg, fg = levels
            score = bg + (fg - bg) * float(
                score_mask[cy0 : cy1 + 1, cx0 : cx1 + 1].mean()
            )
        else:
            score = box_score(pred, x0, y0, x1, y1)
        if score < box_thresh:
            continue
        ex0, ey0, ex1, ey1 = unclip_box(x0, y0, x1, y1, unclip_ratio)
        if (ex1 - ex0) < min_size_box or (ey1 - ey0) < min_size_box:
            continue
        out.append(
            [
                ex0 / w,
                ey0 / h,
                (ex1 + 1) / w,
                (ey1 + 1) / h,
                score,
            ]
        )
    if not out:
        return np.zeros((0, 5), dtype=np.float64)
    return np.clip(np.asarray(out, dtype=np.float64), 0.0, 1.0)


def postprocess_proba_map(
    proba: np.ndarray,
    bin_thresh: float = BIN_THRESH,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = UNCLIP_RATIO,
) -> np.ndarray:
    """Full DB-style postprocess of one (H,W) proba map -> (N,5) boxes."""
    bitmap = binary_open3((proba >= bin_thresh).astype(np.uint8))
    return bitmap_to_boxes(proba, bitmap, box_thresh, unclip_ratio)


# ----------------------------------------------- deterministic "model"


def ink_proba_map(
    img: np.ndarray,
    scale: int,
    ink_level: float = 0.98,
    bg_level: float = 0.02,
) -> np.ndarray:
    """Deterministic stand-in for the DBNet forward pass on raster-font
    pages: ink mask (dark pixels on a white page) dilated vertically by 4s
    and horizontally by 3s. With the font layout (char gap 2s + up to 2s of
    blank glyph edge columns per side => worst inter-glyph ink gap 6s; word
    gap 7s; line leading 9s) this provably fuses every glyph pair of a word
    into one 8-connected blob while keeping words and lines separate."""
    gray = img if img.ndim == 2 else img.mean(axis=-1)
    ink = (gray < 128).astype(np.uint8)
    fused = dilate_horizontal(
        dilate_vertical(ink, V_DILATE_CELLS * scale), H_DILATE_CELLS * scale
    )
    return np.where(fused > 0, ink_level, bg_level).astype(np.float64)


# postprocessor config for the ink-fuse model family: the deterministic
# model does not shrink text regions the way DB training targets do, so its
# unclip ratio is small (just enough to add a safety margin to crops).
INK_MODEL_POSTPROC = {"bin_thresh": BIN_THRESH, "box_thresh": BOX_THRESH, "unclip_ratio": 0.2}


def ink_word_boxes(
    img: np.ndarray,
    scale: int,
    box_thresh: float = BOX_THRESH,
    unclip_ratio: float = 0.2,
    ink_level: float = 0.98,
    bg_level: float = 0.02,
) -> np.ndarray:
    """Fused fast path of ink_proba_map + postprocess_proba_map: identical
    boxes/scores, but all-integer masks (no float64 HxW map). Binarizing the
    two-level proba at bin_thresh reproduces the fused mask exactly, so the
    pipeline skips straight from masks to components."""
    gray = img if img.ndim == 2 else img.mean(axis=-1)
    ink = (gray < 128).astype(np.uint8)
    if scale > 1:
        cells = _ink_cells_if_aligned(
            ink, scale, h_dilate=H_DILATE_CELLS, v_dilate=V_DILATE_CELLS
        )
        if cells is not None:
            # cell-space fast path: the renderer places ink on an s-aligned
            # cell grid, so s x s pooling is lossless and dilation by
            # (4, 3) CELLS == dilation by (4s, 3s) px — every downstream
            # pass (dilate cumsums, components, scoring) touches s^2 = 9x
            # fewer pixels. This is the DRAM-bandwidth lever: the dilation
            # cumsums are the extraction UDF's hot loop and the root-caused
            # 8->32 core scaling limiter (BENCH.md round-3). Boxes are
            # bit-identical to the full-resolution path (proved in
            # tests/test_detection.py); non-aligned input (skewed scans,
            # arbitrary rasters) returns None and takes the exact
            # full-resolution path below.
            fused_c = dilate_horizontal(
                dilate_vertical(cells, V_DILATE_CELLS), H_DILATE_CELLS
            )
            return bitmap_to_boxes(
                None,  # type: ignore[arg-type]
                fused_c,
                box_thresh=box_thresh,
                unclip_ratio=unclip_ratio,
                score_mask=fused_c,
                levels=(bg_level, ink_level),
                cell_scale=scale,
                out_dims=ink.shape,
            )
    fused = dilate_horizontal(
        dilate_vertical(ink, V_DILATE_CELLS * scale), H_DILATE_CELLS * scale
    )
    # 3x3 opening is the identity here: the fused mask is a union of
    # (6s+1)x(8s+1) rectangles (one per ink pixel), each >= 3x3, and
    # opening(U of >=3x3 rects) = U (every rect is a union of contained
    # 3x3 squares; opening is anti-extensive) — so the generic
    # binarize->open->components contract is preserved without the passes.
    return bitmap_to_boxes(
        None,  # type: ignore[arg-type]
        fused,
        box_thresh=box_thresh,
        unclip_ratio=unclip_ratio,
        score_mask=fused,
        levels=(bg_level, ink_level),
    )


def _ink_cells_if_aligned(
    ink: np.ndarray, s: int, h_dilate: int = 3, v_dilate: int = 4
) -> np.ndarray | None:
    """Cell-space (H/s, W/s) 0/1 downsampling of an ink mask, or None when
    the mask is not exactly s-aligned (any partially-inked cell, or ink in
    the partial edge strips / near enough to them that pixel-space dilation
    would enter the strips the cell grid cannot represent).

    ``h_dilate`` / ``v_dilate`` are the CELL dilation radii the caller will
    apply afterwards (ink_word_boxes' fuse step); the edge guards below are
    derived from them (radius + 1), so changing the fuse radii cannot
    silently desynchronize the guard from the dilation reach."""
    H, W = ink.shape
    hc, wc = H // s, W // s
    if hc == 0 or wc == 0:
        return None
    core = ink[: hc * s, : wc * s]
    # strided-slice adds beat a reshape(hc,s,wc,s).sum((1,3)) ~10x here
    # (contiguous row reads, no 4-d intermediate); uint8 is safe to s=15
    dt = np.uint8 if s * s <= 255 else np.int32
    rows = core[0::s].astype(dt, copy=True)
    for i in range(1, s):
        rows += core[i::s]
    cellsum = rows[:, 0::s].copy()
    for i in range(1, s):
        cellsum += rows[:, i::s]
    full = s * s
    if not bool(((cellsum == 0) | (cellsum == full)).all()):
        return None
    if W - wc * s and ink[:, wc * s :].any():
        return None
    if H - hc * s and ink[hc * s :, :].any():
        return None
    cells = (cellsum > 0).astype(np.uint8)
    # conservative guard: ink within dilation reach of a partial edge strip
    # would dilate into pixels the cell grid cannot express -> full-res path
    if W - wc * s and cells[:, max(wc - (h_dilate + 1), 0) :].any():
        return None
    if H - hc * s and cells[max(hc - (v_dilate + 1), 0) :, :].any():
        return None
    return cells
