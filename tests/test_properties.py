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


# ------------------------------------------------------- ONNX proto codec


_tensor_st = st.builds(
    lambda dims, seed: np.random.default_rng(seed)
    .standard_normal(dims)
    .astype(np.float32),
    dims=st.lists(st.integers(1, 5), min_size=1, max_size=4),
    seed=st.integers(0, 2**31 - 1),
)


@settings(max_examples=40, deadline=None)
@given(
    tensors=st.dictionaries(
        st.text(alphabet="abcdefgh_", min_size=1, max_size=8), _tensor_st,
        min_size=0, max_size=3,
    ),
    pads=st.lists(st.integers(0, 9), min_size=4, max_size=4),
    f_attr=st.floats(allow_nan=False, allow_infinity=False, width=32),
    i_attr=st.integers(0, 2**40),
    op=st.sampled_from(["Conv", "Sigmoid", "ReduceMax", "Gemm"]),
)
def test_onnx_proto_round_trip_property(tensors, pads, f_attr, i_attr, op):
    """encode_model -> decode_model is lossless for arbitrary float32
    tensors, packed-int / float / int attributes, and op names — the
    wire-format invariant the committed .onnx checkpoints rely on."""
    from doctr_spark.plans.onnx_proto import decode_model, encode_model, encode_node

    node = encode_node(op, ["x"], ["y"], pads=pads, alpha=float(f_attr), k=int(i_attr))
    blob = encode_model(
        "prop", [node], tensors,
        inputs={"x": [1, "H"]}, outputs={"y": [1, "H"]}, opset=13,
    )
    m = decode_model(blob)
    assert m["graph_name"] == "prop"
    assert m["opset"] == 13
    n = m["nodes"][0]
    assert n["op_type"] == op and n["inputs"] == ["x"] and n["outputs"] == ["y"]
    assert n["attrs"]["pads"] == pads
    assert n["attrs"]["k"] == i_attr
    assert np.float32(n["attrs"]["alpha"]) == np.float32(f_attr)
    assert set(m["initializers"]) == set(tensors)
    for k, v in tensors.items():
        got = m["initializers"][k]
        assert got.shape == v.shape and np.array_equal(got, v)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 3),
    h=st.integers(5, 40),
    w=st.integers(5, 40),
    kh=st.integers(1, 7),
    kw=st.integers(1, 7),
    m=st.integers(1, 4),
    pad=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_numpy_conv_fft_equals_direct(n, h, w, kh, kw, m, pad, seed):
    """The executor's FFT conv path is numerically interchangeable with
    the sliding-window direct path on arbitrary inputs (the dispatch
    threshold must never change results)."""
    from doctr_spark.plans.onnx_exec import _conv2d

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 1, h, w))
    wk = rng.standard_normal((m, 1, min(kh, h + 2 * pad), min(kw, w + 2 * pad)))
    b = rng.standard_normal(m)
    attrs = {"pads": [pad, pad, pad, pad]}
    direct = _conv2d(x, wk, b, attrs, {})
    # force the FFT path regardless of kernel size by faking the size gate:
    # call with a kernel tiled along M? simpler — call the internals via a
    # large-M stack of the same kernel and compare slice 0
    big = np.repeat(wk, max(1, (257 // (wk.shape[2] * wk.shape[3] * m)) + 1), axis=0)
    bb = np.repeat(b, big.shape[0] // m)
    fft_out = _conv2d(x, big, bb, attrs, {})
    assert np.allclose(fft_out[:, : 1], direct[:, :1], atol=1e-8)
