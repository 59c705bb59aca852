"""Page synthesis: draw extracted word nodes back onto a blank page — the
reference's ``Document.synthesize()`` / ``synthesize_page`` surface
(io/elements.py:305-334, utils/reconstitution.py:113-190: render each
word's value at its geometry on a white canvas).

The reference rasterizes through PIL with a TTF font; this engine's
deterministic raster font plays that role, which buys a property the
reference cannot offer: **extract ∘ synthesize ∘ extract is the
identity on text** (re-running the full detection/recognition pipeline
over a synthesized page reproduces every word exactly, because glyphs are
drawn on the same cell grid the recognizer reads). Word placement honors
each node's relative geometry snapped to the cell grid; the renderer's
layout safety bands (word gap 21 px, line gap 27 px at scale 3) are
preserved because extraction boxes never overlap.
"""

from __future__ import annotations

import numpy as np

from ..sources.font import (
    CHAR_GAP_CELLS,
    GLYPH_H,
    GLYPH_W,
    WORD_GAP_CELLS,
    glyph_bitmap,
)


def synthesize_page(
    words: list[dict],
    dims: tuple[int, int],
    scale: int = 3,
    page_idx: int = 0,
) -> np.ndarray:
    """Draw word nodes (dicts with value/xmin/ymin, relative coords, as the
    extraction emits them) onto a white uint8 page of pixel size ``dims``
    (H, W). Each word's top-left is snapped to the ``scale`` cell grid so
    the rendered ink lands exactly on the grid the deterministic
    recognizer (and the committed-weights model zoo) reads."""
    H, W = dims
    page = np.full((H, W), 255, dtype=np.uint8)
    s = scale
    mine = [wd for wd in words if wd.get("page_idx", 0) == page_idx]
    # reading order within the page; line_idx/word_idx when the nodes carry
    # them (extraction output does), geometric fallback otherwise
    mine.sort(
        key=lambda wd: (
            wd.get("line_idx", 0), wd.get("word_idx", 0), wd["ymin"], wd["xmin"]
        )
    )
    prev_end: dict[tuple, int] = {}  # per (line) -> last drawn ink x1
    line_rows: list[int] = []  # fallback line clusters (cell rows)
    for wd in mine:
        value = wd["value"]
        x = int(round(wd["xmin"] * W / s)) * s
        y = int(round(wd["ymin"] * H / s)) * s
        # geometry from extraction is UNCLIPPED (expanded) boxes: each
        # word's drawn start shifts left of its true ink by its own unclip
        # margin, which can erode the inter-word gap below the detector's
        # fuse reach on re-extraction. Enforce the renderer's word-gap
        # safety band within a line (same rule the reference's synthesize
        # applies implicitly by re-rasterizing with font metrics).
        if "line_idx" in wd:
            line_key = ("idx", wd["line_idx"])
        else:
            # foreign-engine nodes (no line_idx): cluster by drawn cell
            # row — words whose rows sit within a glyph height of an open
            # line share it, so slightly-different ymin values from
            # another engine still get the same-line gap enforcement
            row = y // s
            for ci, cr in enumerate(line_rows):
                if abs(row - cr) < GLYPH_H:
                    line_key = ("row", ci)
                    break
            else:
                line_rows.append(row)
                line_key = ("row", len(line_rows) - 1)
        if line_key in prev_end:
            x = max(x, prev_end[line_key] + WORD_GAP_CELLS * s)
        cx = x
        for ch in value:
            try:
                bm = glyph_bitmap(ch)
            except KeyError:
                # out-of-vocab character (e.g. the recognizer's unknown
                # sentinel, or text from a seam model with a larger
                # vocab): advance without ink — the reference synthesize
                # is robust to arbitrary text the same way
                cx += (GLYPH_W + CHAR_GAP_CELLS) * s
                continue
            block = np.kron(bm, np.ones((s, s), dtype=np.uint8))
            # clip on ALL four edges (geometry from other engines can be
            # unclipped/negative; draw the visible part, never raise)
            y0c, x0c = max(y, 0), max(cx, 0)
            y1 = min(y + GLYPH_H * s, H)
            x1 = min(cx + GLYPH_W * s, W)
            if y1 > y0c and x1 > x0c:
                oy, ox = y0c - y, x0c - cx
                region = page[y0c:y1, x0c:x1]
                region[block[oy : oy + (y1 - y0c), ox : ox + (x1 - x0c)] > 0] = 0
            cx += (GLYPH_W + CHAR_GAP_CELLS) * s
        prev_end[line_key] = cx - CHAR_GAP_CELLS * s
    return page


def synthesize_pages(
    words: list[dict], n_pages: int, dims: tuple[int, int], scale: int = 3
) -> list[np.ndarray]:
    """Document.synthesize(): one canvas per page (io/elements.py:626-634)."""
    return [synthesize_page(words, dims, scale, page_idx=p) for p in range(n_pages)]
