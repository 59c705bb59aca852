"""Raster font + deterministic OCR loop: glyph table integrity, page
rendering, detection fusing guarantees, crop decoding."""

import numpy as np
import pytest

from doctr_spark.functions.vocabs import FONT, font_normalize
from doctr_spark.operators.detection import INK_MODEL_POSTPROC, ink_proba_map, postprocess_proba_map
from doctr_spark.operators.geometry import extract_crops
from doctr_spark.operators.builder import build_page
from doctr_spark.sources import font


def test_glyph_table_complete_and_unique():
    lut = font.build_glyph_lut()  # raises on collision
    assert len(lut) == len(FONT)


def test_glyphs_have_no_wide_internal_blank_columns():
    # segmentation splits at blank column runs wider than one cell; every
    # glyph must keep internal blank runs <= 1 cell
    for ch in FONT:
        bm = font.glyph_bitmap(ch)
        cols = bm.any(axis=0)
        first, last = np.flatnonzero(cols)[[0, -1]]
        run = 0
        for c in cols[first : last + 1]:
            run = 0 if c else run + 1
            assert run <= 1, f"glyph {ch!r} has a wide internal blank run"


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_ocr_loop_exact(scale):
    words = "THE QUICK BROWN FOX! 0123456789 (A+B=C) 50% R&D 'X' Z".split()
    img, _ = font.render_page(words, scale=scale)
    proba = ink_proba_map(img, scale)
    boxes = postprocess_proba_map(proba, **INK_MODEL_POSTPROC)
    assert boxes.shape[0] == len(words)
    crops = extract_crops(img, boxes[:, :4])
    texts = [font.read_word_crop(c, scale) for c in crops]
    page = build_page(boxes[:, :4], texts, boxes[:, 4])
    assert page.text == "\n".join(font.expected_page_lines(words, scale=scale))


def test_ocr_all_font_chars():
    # every glyph decodes correctly in word context
    words = ["".join(FONT[i : i + 6]) for i in range(0, len(FONT), 6)]
    img, _ = font.render_page(words, scale=3)
    boxes = postprocess_proba_map(ink_proba_map(img, 3), **INK_MODEL_POSTPROC)
    crops = extract_crops(img, boxes[:, :4])
    texts = [font.read_word_crop(c, 3) for c in crops]
    page = build_page(boxes[:, :4], texts, boxes[:, 4])
    assert page.text == "\n".join(font.expected_page_lines(words, scale=3))


def test_multiline_wrap_order():
    words = [f"W{i:02d}" for i in range(40)]  # forces several wrapped lines
    img, placed = font.render_page(words, scale=3)
    lines = font.expected_page_lines(words, scale=3)
    assert len(lines) > 1
    boxes = postprocess_proba_map(ink_proba_map(img, 3), **INK_MODEL_POSTPROC)
    crops = extract_crops(img, boxes[:, :4])
    texts = [font.read_word_crop(c, 3) for c in crops]
    page = build_page(boxes[:, :4], texts, boxes[:, 4])
    assert page.text == "\n".join(lines)


def test_single_word_page():
    img, _ = font.render_page(["HI!"], scale=3)
    boxes = postprocess_proba_map(ink_proba_map(img, 3), **INK_MODEL_POSTPROC)
    assert boxes.shape[0] == 1
    [crop] = extract_crops(img, boxes[:, :4])
    assert font.read_word_crop(crop, 3) == "HI!"


def test_font_normalize():
    assert font_normalize("Hello, World!") == "HELLO, WORLD!"
    assert font_normalize("café") == "CAFE"
    assert font_normalize("a  b\t c") == "A B C"
    assert font_normalize("") == ""
