"""Export the tiny-conv model pair as REAL ``.onnx`` files (hand-encoded
ModelProto via plans/onnx_proto.py — no onnx package needed), so the
onnx_detector / onnx_recognizer loader factories (plans/models.py) execute
an actual serialized checkpoint end-to-end in this sandbox.

Detector graph (DBNet-style proba-map head, tiny_conv det weights folded
into two Conv+Sigmoid stages; input is the page normalized to [0,1] as the
factory feeds it, so the 1x1 stem carries the x255 un-normalization):

    input (1,1,H,W) -> Conv(1x1, w=-255, b=128.5) -> Sigmoid      # ink map
                    -> Conv(25x19 'same', w=gain*k2, b=gain*b2) -> Sigmoid

Recognizer graph (matched-filter CRNN head at PIXEL resolution — the
factory stacks raw crops, so the grid-anchoring trim is replaced by ring
gating: each glyph filter is its ±1 pixel template surrounded by a one-cell
ring of strongly negative weights, which re-expresses the flank-blank and
span-containment gates as convolution weights; exactness over the font is
sweep-proven in tests):

    input (N,1,h,w) -> Sub(1, x)                                  # ink
                    -> Conv((V+1) x 1 x (7+2)s x (5+2)s, pads=s)  # scores
                    -> ReduceMax(axis=2) -> Transpose(0,2,1)      # (N,T,V+1)

Channel V is the all-zero blank filter (logit 0), matching the CRNN class
layout ctc_best_path expects.
"""

from __future__ import annotations

import os

import numpy as np

from .onnx_proto import encode_model, encode_node

MODELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "models_data"
)
ONNX_DET_PATH = os.path.join(MODELS_DIR, "tiny_conv_det_v1.onnx")
ONNX_RECO_PATH = os.path.join(MODELS_DIR, "tiny_conv_reco_v1.onnx")

_RING_PENALTY = 1000.0  # any inked ring pixel drops the score below blank
_TEMP = 10.0  # logit temperature (folded into weights/bias)


def build_detector_onnx() -> bytes:
    """Serialize the tiny_conv detection net (committed npz weights) as a
    Conv->Sigmoid->Conv->Sigmoid ONNX graph."""
    from .tiny_conv import WEIGHTS_PATH, _load_weights

    w = _load_weights(WEIGHTS_PATH)
    k2 = w["det_k2"].astype(np.float32)
    gain = float(w["det_gain"])
    kh, kw = k2.shape
    nodes = [
        encode_node("Conv", ["input", "stem_w", "stem_b"], ["stem"], pads=[0, 0, 0, 0]),
        encode_node("Sigmoid", ["stem"], ["ink"]),
        encode_node(
            "Conv", ["ink", "fuse_w", "fuse_b"], ["fused"],
            pads=[kh // 2, kw // 2, kh // 2, kw // 2],
        ),
        encode_node("Sigmoid", ["fused"], ["proba"]),
    ]
    inits = {
        # the factory feeds page/255; the stem's trained form is
        # sigmoid(det_w1 * gray + det_b1), so w = det_w1 * 255
        "stem_w": np.array(float(w["det_w1"]) * 255.0, np.float32).reshape(1, 1, 1, 1),
        "stem_b": np.array([float(w["det_b1"])], np.float32),
        "fuse_w": (gain * k2).reshape(1, 1, kh, kw),
        "fuse_b": np.array([gain * float(w["det_b2"])], np.float32),
    }
    return encode_model(
        "tiny-conv-det", nodes, inits,
        inputs={"input": [1, 1, "H", "W"]}, outputs={"proba": [1, 1, "H", "W"]},
    )


def build_recognizer_onnx() -> bytes:
    """Serialize the ring-gated pixel-space matched-filter recognizer as a
    Sub->Conv->ReduceMax->Transpose ONNX graph."""
    from ..functions.vocabs import FONT
    from ..sources.font import glyph_bitmap
    from .tiny_conv import _load_weights, WEIGHTS_PATH

    s = int(_load_weights(WEIGHTS_PATH)["scale"])
    v = len(FONT)
    kh, kw = (7 + 2) * s, (5 + 2) * s
    filters = np.zeros((v + 1, 1, kh, kw), dtype=np.float32)
    bias = np.zeros(v + 1, dtype=np.float32)
    for i, ch in enumerate(FONT):
        cell = 2.0 * glyph_bitmap(ch).astype(np.float64) - 1.0
        f = np.full((kh, kw), -_RING_PENALTY)
        f[s:-s, s:-s] = np.kron(cell, np.ones((s, s)))
        filters[i, 0] = (f * _TEMP).astype(np.float32)
        n_ink = int((cell > 0).sum()) * s * s
        bias[i] = -(n_ink - 0.5) * _TEMP
    nodes = [
        encode_node("Sub", ["one", "input"], ["ink"]),
        encode_node("Conv", ["ink", "rec_w", "rec_b"], ["scores"], pads=[s, s, s, s]),
        encode_node("ReduceMax", ["scores"], ["colmax"], axes=[2], keepdims=0),
        encode_node("Transpose", ["colmax"], ["logits"], perm=[0, 2, 1]),
    ]
    inits = {
        "one": np.ones((1, 1, 1, 1), dtype=np.float32),
        "rec_w": filters,
        "rec_b": bias,
    }
    return encode_model(
        "tiny-conv-reco", nodes, inits,
        inputs={"input": ["N", 1, "H", "W"]}, outputs={"logits": ["N", "T", v + 1]},
    )


def write_onnx_models() -> None:
    for path, build in ((ONNX_DET_PATH, build_detector_onnx), (ONNX_RECO_PATH, build_recognizer_onnx)):
        blob = build()
        with open(path, "wb") as fh:
            fh.write(blob)
        print(f"wrote {path}: {len(blob)} bytes")
