"""Property-based tests (hypothesis) for the deterministic kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from doctr_spark.functions.html import extract_main_text
from doctr_spark.functions.vocabs import FONT, encode_string
from doctr_spark.operators.builder import build_page, resolve_lines
from doctr_spark.operators.detection import ink_word_boxes
from doctr_spark.operators.geometry import extract_crops
from doctr_spark.operators.recognition import (
    ctc_best_path,
    indices_to_logits,
    levenshtein,
    merge_strings,
)
from doctr_spark.sources import font

words_st = st.lists(
    st.text(alphabet=FONT, min_size=1, max_size=8), min_size=1, max_size=30
)


@settings(max_examples=25, deadline=None)
@given(words_st)
def test_ocr_roundtrip_any_font_words(words):
    """Render -> detect -> crop -> recognize -> build recovers the exact
    layout lines for arbitrary font-charset words."""
    img, _ = font.render_page(words, scale=3)
    boxes = ink_word_boxes(img, 3)
    assert boxes.shape[0] == len(words)
    crops = extract_crops(img, boxes[:, :4])
    texts = [font.read_word_crop(c, 3) for c in crops]
    page = build_page(boxes[:, :4], texts, boxes[:, 4])
    assert page.text == "\n".join(font.expected_page_lines(words, scale=3))


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=FONT, min_size=0, max_size=24))
def test_ctc_logits_roundtrip(s):
    [(word, conf)] = ctc_best_path(indices_to_logits(encode_string(s, FONT)), FONT)
    assert word == s
    if s:
        assert conf > 0.99


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=12), st.text(max_size=12))
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity
    assert d <= max(len(a), len(b))  # upper bound


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdef", max_size=10), st.text(alphabet="abcdef", max_size=10))
def test_merge_strings_total(a, b):
    out = merge_strings(a, b, 1.4)
    # merged string never exceeds concatenation, never shorter than longest input - 1
    assert len(out) <= len(a) + len(b)
    if not a or not b:
        assert out == (a or b)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0.0, 0.8), st.floats(0.0, 0.8), st.floats(0.02, 0.19), st.floats(0.02, 0.19)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_resolve_lines_partition_property(raw):
    """resolve_lines always yields a partition of all box indices."""
    boxes = np.array([[x, y, x + w, y + h] for x, y, w, h in raw])
    lines = resolve_lines(boxes)
    flat = sorted(i for line in lines for i in line)
    assert flat == list(range(len(boxes)))


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_html_strip_never_crashes_and_is_idempotent_on_plain(s):
    out = extract_main_text(s)
    assert isinstance(out, str)
    # plain text with no tags: stripping is whitespace-normalization only
    if "<" not in s and "&" not in s:
        assert out == " ".join(s.split())
