"""Committed real .onnx checkpoints through the onnx_detector /
onnx_recognizer factories (plans/models.py) — the serialized-checkpoint
load path EXECUTED, not stub-tested: the files are hand-encoded ONNX
ModelProto protobufs (plans/onnx_proto.py, field numbers from the public
onnx.proto) run by the bundled numpy executor (plans/onnx_exec.py) when
onnxruntime is absent, or by onnxruntime itself when installed.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from doctr_spark.functions.vocabs import FONT
from doctr_spark.operators.detection import INK_MODEL_POSTPROC, ink_word_boxes
from doctr_spark.plans.models import onnx_detector, onnx_recognizer
from doctr_spark.plans.onnx_export import (
    ONNX_DET_PATH,
    ONNX_RECO_PATH,
    build_detector_onnx,
    build_recognizer_onnx,
)
from doctr_spark.plans.onnx_proto import decode_model, encode_model, encode_node
from doctr_spark.sources.font import DEFAULT_SCALE, render_page


def test_committed_onnx_files_match_builder():
    for path, build in (
        (ONNX_DET_PATH, build_detector_onnx),
        (ONNX_RECO_PATH, build_recognizer_onnx),
    ):
        with open(path, "rb") as fh:
            assert fh.read() == build(), path


def test_onnx_files_parse_as_model_protos():
    with open(ONNX_DET_PATH, "rb") as fh:
        det = decode_model(fh.read())
    assert [n["op_type"] for n in det["nodes"]] == ["Conv", "Sigmoid", "Conv", "Sigmoid"]
    assert det["inputs"] == ["input"] and det["outputs"] == ["proba"]
    assert det["opset"] == 13
    with open(ONNX_RECO_PATH, "rb") as fh:
        rec = decode_model(fh.read())
    assert [n["op_type"] for n in rec["nodes"]] == ["Sub", "Conv", "ReduceMax", "Transpose"]
    assert rec["initializers"]["rec_w"].shape == (len(FONT) + 1, 1, 27, 21)


def test_proto_round_trip():
    """encode -> decode is lossless for the schema subset."""
    w = np.arange(8, dtype=np.float32).reshape(2, 1, 2, 2)
    blob = encode_model(
        "rt",
        [encode_node("Conv", ["x", "w"], ["y"], pads=[1, 1, 1, 1], strides=[2, 2])],
        {"w": w},
        inputs={"x": [1, 1, "H", "W"]},
        outputs={"y": [1, 2, "H", "W"]},
    )
    m = decode_model(blob)
    assert m["graph_name"] == "rt"
    assert m["nodes"][0]["attrs"] == {"pads": [1, 1, 1, 1], "strides": [2, 2]}
    assert np.array_equal(m["initializers"]["w"], w)


def test_numpy_executor_rejects_unsupported_ops(tmp_path):
    from doctr_spark.plans.onnx_exec import NumpySession

    blob = encode_model(
        "bad", [encode_node("LSTM", ["x"], ["y"])], {},
        inputs={"x": [1]}, outputs={"y": [1]},
    )
    p = tmp_path / "bad.onnx"
    p.write_bytes(blob)
    with pytest.raises(NotImplementedError, match="LSTM"):
        NumpySession(str(p))


def test_onnx_detector_boxes_match_ink_family():
    det = onnx_detector(ONNX_DET_PATH, postproc=INK_MODEL_POSTPROC)[1]()
    for words in (["HELLO", "WORLD"], ["A+B=C", "R&D", "#1"], ["READY.", "GO!", "OK,"]):
        img, _ = render_page(words, scale=DEFAULT_SCALE)
        got = det(img, DEFAULT_SCALE)
        ref = ink_word_boxes(img, DEFAULT_SCALE)
        assert got.shape == ref.shape
        assert np.allclose(got[:, :4], ref[:, :4])


def test_onnx_recognizer_full_vocab_sweep_exact():
    """Every glyph alone and paired decodes exactly through the ring-gated
    pixel-space matched filter — including the containment ambiguities the
    ring gating must kill (':' holds '.', '!' holds '.', ''' in 'A')."""
    rec = onnx_recognizer(ONNX_RECO_PATH)[1]()
    words = (
        list(FONT)
        + [FONT[i] + FONT[(i * 7 + 3) % len(FONT)] for i in range(len(FONT))]
        + [":.", ".:", "'!", "A'", "KAYAK", "L.K.<"]
    )
    crops = []
    for w in words:
        img, placed = render_page([w], scale=DEFAULT_SCALE)
        _, x0, y0, x1, y1 = placed[0]
        m = 5  # unclipped-box style margin
        crops.append(img[max(0, y0 - m) : y1 + m, max(0, x0 - m) : x1 + m])
    got = rec(crops, DEFAULT_SCALE)
    bad = [(w, t) for w, (t, _) in zip(words, got) if t != w]
    assert not bad, bad[:5]
    assert all(0.0 < c <= 1.0 for _, c in got)


def test_extract_turns_onnx_models_equality(spark):
    """End-to-end per-turn equality through extract_turns with BOTH
    committed .onnx checkpoints via the loader factories."""
    from doctr_spark.plans.pipeline import extract_turns
    from doctr_spark.sources.corpus import make_transcripts

    gen = make_transcripts(spark, 2, partitions=2, ocr_ratio=1.0, html_ratio=0.0)
    inp = gen.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    exp = gen.select("conv_id", "turn_idx", "expected_text")
    out = extract_turns(
        inp,
        detector=onnx_detector(ONNX_DET_PATH, postproc=INK_MODEL_POSTPROC),
        recognizer=onnx_recognizer(ONNX_RECO_PATH),
    )
    m = out.join(exp, ["conv_id", "turn_idx"])
    n_total = m.count()
    n_exact = m.filter(F.col("extracted_text") == F.col("expected_text")).count()
    assert n_total > 0
    assert n_exact == n_total


def test_numpy_executor_fft_cache_is_bounded():
    """Heterogeneous input shapes must not grow the kernel-spectrum cache
    without bound (sessions live for the worker process lifetime)."""
    from doctr_spark.plans.onnx_exec import _FFT_CACHE_MAX, NumpySession

    sess = NumpySession(ONNX_RECO_PATH)
    for i in range(_FFT_CACHE_MAX + 5):
        x = np.ones((1, 1, 30 + i, 40 + 2 * i), dtype=np.float32)
        sess.run(None, {"input": x})
    assert len(sess._fft_cache) <= _FFT_CACHE_MAX


def test_decode_model_rejects_garbage():
    """Truncated or non-protobuf bytes fail loudly, never half-parse."""
    from doctr_spark.plans.onnx_proto import decode_model

    with open(ONNX_DET_PATH, "rb") as fh:
        blob = fh.read()
    for bad in (blob[: len(blob) // 2], b"\x00\x01\x02", b""):
        with pytest.raises((ValueError, IndexError, KeyError)):
            decode_model(bad)
