"""Document.synthesize() equivalent (functions/synthesize.py, reference
io/elements.py:305-334 + utils/reconstitution.py:113-190) — with the
round-trip property the deterministic raster font makes provable:
extract(synthesize(extract(page))) == extract(page) on text AND word
structure."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctr_spark.functions.synthesize import synthesize_page, synthesize_pages
from doctr_spark.plans.pipeline import extract_pages_ocr
from doctr_spark.sources.font import DEFAULT_SCALE, render_page


def _extract(pages):
    return extract_pages_ocr(pages, DEFAULT_SCALE)


def test_roundtrip_single_page_exact():
    words = ["HELLO", "WORLD", "KAYAK", "L.K.<", "ALPHA", "R&D", "#1", "OK,"]
    img, _ = render_page(words, scale=DEFAULT_SCALE)
    text, n_pages, n_boxes, _, _, wnodes, _ = _extract([img])
    synth = synthesize_pages(wnodes, n_pages, img.shape, scale=DEFAULT_SCALE)
    text2, _, n_boxes2, _, _, wnodes2, _ = _extract(synth)
    assert text2 == text
    assert n_boxes2 == n_boxes
    assert [w["value"] for w in wnodes2] == [w["value"] for w in wnodes]
    assert [(w["line_idx"], w["word_idx"]) for w in wnodes2] == [
        (w["line_idx"], w["word_idx"]) for w in wnodes
    ]


def test_roundtrip_multi_page_and_page_routing():
    pages = []
    for ws in (["ALPHA", "BRAVO"], ["CHARLIE"], ["DELTA", "ECHO", "FOX"]):
        pages.append(render_page(ws, scale=DEFAULT_SCALE)[0])
    # pad pages to a common canvas (synthesize draws per page_idx)
    H = max(p.shape[0] for p in pages)
    W = max(p.shape[1] for p in pages)
    canvas = []
    for p in pages:
        c = np.full((H, W), 255, dtype=np.uint8)
        c[: p.shape[0], : p.shape[1]] = p
        canvas.append(c)
    text, n_pages, _, _, _, wnodes, _ = _extract(canvas)
    assert n_pages == 3
    synth = synthesize_pages(wnodes, n_pages, (H, W), scale=DEFAULT_SCALE)
    text2, *_ = _extract(synth)
    assert text2 == text
    # per-page isolation: page 1 holds only CHARLIE's ink
    only_p1 = synthesize_page(wnodes, (H, W), scale=DEFAULT_SCALE, page_idx=1)
    t_p1, *_ = _extract([only_p1])
    assert t_p1 == "CHARLIE"


def test_synthesize_clips_at_canvas_edge():
    """A word whose geometry lands at the canvas edge draws the visible
    part and never raises (reference synthesize is clip-safe too)."""
    node = {"value": "WIDE", "xmin": 0.95, "ymin": 0.9, "page_idx": 0}
    page = synthesize_page([node], (60, 120), scale=DEFAULT_SCALE)
    assert page.shape == (60, 120)
    assert (page < 128).any()  # some ink drawn


def test_roundtrip_through_extract_turns(spark):
    """Distributed round trip: extract OCR turns, synthesize each turn's
    pages from its word nodes inside a pandas UDF, re-extract, compare."""
    from doctr_spark.plans.pipeline import extract_turns
    from doctr_spark.sources.corpus import make_transcripts
    from doctr_spark.sources.payloads import encode_page_bundle, tool_envelope

    gen = make_transcripts(spark, 1, partitions=1, ocr_ratio=1.0, html_ratio=0.0)
    inp = gen.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    first = extract_turns(inp).select(
        "conv_id", "turn_idx", "extracted_text", "n_pages", "words"
    )
    rows = first.collect()
    assert rows
    re_rows = []
    for r in rows:
        wnodes = [w.asDict() for w in r["words"]]
        pages = synthesize_pages(wnodes, r["n_pages"], (660, 640), scale=DEFAULT_SCALE)
        re_rows.append(
            (
                r["conv_id"], r["turn_idx"], "user", "[synth]",
                tool_envelope("page_bundle", encode_page_bundle(pages, DEFAULT_SCALE)),
                None,
            )
        )
    re_df = spark.createDataFrame(
        re_rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    second = extract_turns(re_df).select("conv_id", "turn_idx", "extracted_text")
    j = second.withColumnRenamed("extracted_text", "second").join(
        first.select("conv_id", "turn_idx", "extracted_text"), ["conv_id", "turn_idx"]
    )
    assert j.filter(F.col("second") != F.col("extracted_text")).count() == 0


# ------------------------------------------------------------- visualize


def test_visualize_page_outlines_every_word():
    from doctr_spark.functions.visualize import WORD_COLOR, visualize_page

    words = ["HELLO", "WORLD", "KAYAK"]
    img, _ = render_page(words, scale=DEFAULT_SCALE)
    _, n_pages, _, _, _, wnodes, _ = _extract([img])
    overlay = visualize_page(img, wnodes)
    assert overlay.shape == (*img.shape, 3)
    H, W = img.shape
    for w in wnodes:
        y0 = int(round(w["ymin"] * H)); x0 = int(round(w["xmin"] * W))
        assert tuple(overlay[y0, x0]) == WORD_COLOR  # outline corner drawn
    # ink preserved away from outlines: pick an interior ink pixel
    ys, xs = np.nonzero(img < 128)
    inner = [(y, x) for y, x in zip(ys[:500], xs[:500])
             if not (overlay[y, x] != [img[y, x]] * 3).any()]
    assert inner  # most ink pixels untouched


def test_visualize_lines_and_artefacts():
    from doctr_spark.functions.visualize import (
        ARTEFACT_COLOR,
        LINE_COLOR,
        visualize_page,
    )

    img, _ = render_page(["ALPHA", "BRAVO"], scale=DEFAULT_SCALE)
    _, _, _, _, _, wnodes, _ = _extract([img])
    art = [{"xmin": 0.8, "ymin": 0.1, "xmax": 0.95, "ymax": 0.3, "page_idx": 0}]
    overlay = visualize_page(img, wnodes, artefacts=art, words_only=False)
    H, W = img.shape
    # the line outline sits 2 px outside the word-box union (visible
    # nesting; an un-offset rect would be overdrawn by word outlines,
    # since dilated+unclipped word boxes tile the line edge-to-edge)
    ws = sorted(wnodes, key=lambda w: w["xmin"])
    gap_x = int(round((ws[0]["xmax"] + ws[1]["xmin"]) / 2 * W))
    ly = int(round(min(w["ymin"] for w in wnodes) * H)) - 2
    assert tuple(overlay[ly, gap_x]) == LINE_COLOR
    ax, ay = int(round(0.8 * W)), int(round(0.1 * H))
    assert tuple(overlay[ay, ax]) == ARTEFACT_COLOR


def test_synthesize_skips_out_of_vocab_chars():
    """Unknown-sentinel / foreign characters advance without ink instead
    of crashing (the reference synthesize is robust to arbitrary text)."""
    nodes = [{"value": "A■B", "xmin": 0.1, "ymin": 0.3, "page_idx": 0}]
    page = synthesize_page(nodes, (90, 300), scale=DEFAULT_SCALE)
    t, *_ = _extract([page])
    # the skipped glyph leaves a gap wide enough to split the word; both
    # real glyphs survive, the sentinel never reaches the page
    assert t.replace(" ", "") == "AB"


def test_synthesize_clips_negative_coords():
    """Negative geometry (other engines emit unclipped boxes) clips at
    the canvas edge — partial ink, no exception."""
    page = synthesize_page(
        [{"value": "EDGE", "xmin": -0.05, "ymin": -0.05, "page_idx": 0}],
        (90, 300),
        scale=DEFAULT_SCALE,
    )
    assert page.shape == (90, 300)
    assert (page < 128).any()  # visible part drawn


def test_foreign_nodes_same_line_gap_enforced():
    """Nodes WITHOUT line_idx (a foreign engine's output) whose ymin
    values differ slightly still cluster onto one line, so the word-gap
    safety band applies and re-extraction keeps the words separate."""
    s = DEFAULT_SCALE
    # two same-line words, second one placed overlapping-close to the
    # first AND with a 2-cell ymin jitter (sub-glyph-height): without
    # row clustering they'd get distinct keys and draw fused
    words = [
        {"value": "AB", "xmin": 0.10, "ymin": 0.300},
        {"value": "CD", "xmin": 0.16, "ymin": 0.312},  # jittered ymin
    ]
    page = synthesize_page(words, dims=(240, 480), scale=s)
    text, _, n_boxes, *_ = _extract([page])
    assert n_boxes == 2
    assert text.replace("\n", " ") == "AB CD"


def test_foreign_nodes_different_lines_keep_own_keys():
    """Rows a full line pitch apart stay distinct clusters: the second
    word keeps its own x position instead of being pushed right."""
    words = [
        {"value": "AB", "xmin": 0.10, "ymin": 0.10},
        {"value": "CD", "xmin": 0.10, "ymin": 0.50},
    ]
    page = synthesize_page(words, dims=(240, 480), scale=DEFAULT_SCALE)
    text, _, n_boxes, *_ = _extract([page])
    assert n_boxes == 2
    assert text == "AB\nCD"
