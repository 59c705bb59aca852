"""tiny-conv-v1: a real (non-stand-in) model pair executed through the
pluggable model seam (plans/models.py), with weights committed as data.

Answers the reference's custom-model contract (detection/zoo.py:59-71,
recognition/zoo.py:41-52: *any* model instance drops into the predictors)
with an actual weights-file lifecycle that runs in this sandbox — no
onnxruntime/torch required, the forwards are plain numpy:

- detector ``tiny-conv-det-v1``: a 2-layer convolutional net.
  Layer 1 is a 1x1 conv + sigmoid (ink activation); layer 2 convolves a
  (8s+1, 6s+1) fusion kernel (FFT convolution — one real conv, not a
  morphology shortcut) and squashes through a gained sigmoid into the
  text-probability map. The map then goes through the SAME DB-style
  postprocessor every detector family uses (binarize -> 3x3 open ->
  components -> score -> unclip), mirroring how a real DBNet head would
  plug in (reference differentiable_binarization/base.py:41-152).
- recognizer ``tiny-crnn-v1``: matched-filter CRNN — one conv filter per
  vocab glyph (weights +1 on template ink, -1 off), per-channel bias
  -(n_ink - 0.5) so a filter fires above the blank channel iff its
  receptive field equals the glyph exactly, max-pool over the vertical
  axis, temperature-scaled logits over (T, V+1), then the shared CTC
  best-path decoder (operators/recognition.py) — the CRNN composition
  (conv features -> per-timestep logits -> CTC) with the recurrent stack
  folded into the matched filters, which is exactly what a converged
  conv stack learns on a deterministic raster font.

The weights live in ``doctr_spark/models_data/tiny_conv_v1.npz``
(regenerable via ``scripts/make_tiny_weights.py``) and load ONCE per
Python worker through ``resolve_model`` — the same per-executor-core
lifecycle a torch/ONNX checkpoint gets (SURVEY.md §4.4).
"""

from __future__ import annotations

import os

import numpy as np

from .models import ModelLoader

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models_data",
    "tiny_conv_v1.npz",
)

DET_KEY = "tiny-conv-det-v1"
REC_KEY = "tiny-crnn-v1"


def make_tiny_weights() -> dict[str, np.ndarray]:
    """Construct the tiny-conv-v1 weight tensors (what a training run would
    converge to on the deterministic raster font — matched filters are the
    optimal template detectors, so we write the optimum directly instead of
    shipping an SGD trajectory; the FORWARD code treats these as opaque
    learned tensors)."""
    from ..functions.vocabs import FONT
    from ..sources.font import glyph_bitmap

    s = 3  # render scale the detector kernel is sized for (DEFAULT_SCALE)
    det_k2 = np.ones((8 * s + 1, 6 * s + 1), dtype=np.float32)
    rec_w = np.stack(
        [(2.0 * glyph_bitmap(ch).astype(np.float32) - 1.0) for ch in FONT]
    )  # (V, 7, 5): +1 on glyph ink, -1 off
    rec_b = -(rec_w.reshape(len(FONT), -1).clip(0).sum(axis=1) - 0.5)  # -(n_ink - .5)
    return {
        "scale": np.int64(s),
        "det_w1": np.float32(-1.0),
        "det_b1": np.float32(128.5),
        "det_k2": det_k2,
        "det_gain": np.float32(20.0),
        "det_b2": np.float32(-0.5),
        "rec_w": rec_w,
        "rec_b": rec_b.astype(np.float32),
        "rec_temp": np.float32(10.0),
        "vocab": np.array(FONT),
    }


def _load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def conv2d_same(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'same' 2D convolution (zero-padded, centered odd kernel) via FFT —
    the standard dense conv forward for page-sized inputs."""
    kh, kw = kernel.shape
    H, W = x.shape
    fh, fw = H + kh - 1, W + kw - 1
    full = np.fft.irfft2(
        np.fft.rfft2(x, (fh, fw)) * np.fft.rfft2(kernel.astype(np.float64), (fh, fw)),
        (fh, fw),
    )
    return full[kh // 2 : kh // 2 + H, kw // 2 : kw // 2 + W]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def crop_cells(crop: np.ndarray, scale: int) -> np.ndarray | None:
    """Trim a word crop to its ink bounds and stride-``scale`` subsample to
    CELL space (the model's fixed input resolution — the analog of a CRNN's
    resize-to-32px preprocessing). None when the crop holds no ink."""
    if crop.size == 0:
        return None
    ink = (crop < 128) if crop.ndim == 2 else (crop.mean(axis=-1) < 128)
    ys, xs = np.nonzero(ink)
    if ys.size == 0:
        return None
    return np.ascontiguousarray(
        ink[ys.min() : ys.max() + 1 : scale, xs.min() : xs.max() + 1 : scale]
    ).astype(np.float64)


def glyph_evidence(cells: np.ndarray, filters: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """Gated matched-filter conv stage shared by the committed-weights
    recognizers: returns per-column glyph evidence E of shape (T, V) with
    ``E[c, v] > 0`` iff the (kh, kw) window starting at padded column c
    holds EXACTLY glyph v (score peaks at +0.5; any mismatch drops it to
    <= -0.5; gated-invalid windows sit near -1e3).

    The two validity gates kill real sub-glyph ambiguities (see the inline
    comments); the vertical max-pool makes the evidence row-offset
    invariant. This is the conv backbone every tiny-* recognizer variant
    shares — the family-defining sequence modeling and decode layers differ
    per variant (plans/tiny_reco_zoo.py)."""
    kh, kw = filters.shape[1:]
    g = np.pad(cells, ((kh - 1, kh - 1), (kw - 1, kw - 1)))
    win = np.lib.stride_tricks.sliding_window_view(g, (kh, kw))  # (ny,nx,kh,kw)
    scores = np.einsum("yxhw,vhw->yxv", win, filters)  # conv, all glyph channels
    # local-evidence gate: a window may fire only when it holds ALL
    # the ink of its 5-column span — otherwise a vertically/
    # horizontally truncated slice of a big glyph is pixel-identical
    # to a small one (the bottom two pixels of an 'A' stem ARE an
    # apostrophe) and the matched filter would hallucinate it
    win_count = win.sum(axis=(2, 3))  # (ny, nx)
    colsum = g.sum(axis=0)
    span = np.lib.stride_tricks.sliding_window_view(colsum, kw).sum(axis=-1)
    # ...and the columns flanking the window must be blank (glyph
    # separation): '<' is pixel-identical to a 'K' minus its left
    # stem, so without the flank check the filter for '<' fires one
    # column into every 'K'
    edge = np.concatenate(([0.0], colsum, [0.0]))
    flank_blank = (edge[: len(span)] == 0) & (edge[kw + 1 :] == 0)
    valid = (win_count == span[None, :]) & flank_blank[None, :]
    scores = np.where(valid[:, :, None], scores, -1e3)
    col_scores = scores.max(axis=0)  # vertical max-pool -> (T, V)
    return col_scores + bias


def tiny_conv_detector(weights_path: str | None = None) -> ModelLoader:
    """(key, loader) for the tiny conv detection net; drop-in for the
    ``detector=`` seam of ``extract_turns``."""
    path = weights_path or WEIGHTS_PATH

    def load():
        from ..operators.detection import INK_MODEL_POSTPROC, postprocess_proba_map

        w = _load_weights(path)
        w1, b1 = float(w["det_w1"]), float(w["det_b1"])
        k2 = w["det_k2"]
        gain, b2 = float(w["det_gain"]), float(w["det_b2"])
        trained_scale = int(w["scale"])

        def detect(page: np.ndarray, scale: int) -> np.ndarray:
            if scale != trained_scale:
                raise ValueError(
                    f"{DET_KEY} weights are sized for render scale {trained_scale}, got {scale}"
                )
            gray = page if page.ndim == 2 else page.mean(axis=-1)
            a1 = _sigmoid(w1 * gray.astype(np.float64) + b1)  # ink activation
            proba = _sigmoid(gain * (conv2d_same(a1, k2) + b2))  # fused text map
            return postprocess_proba_map(proba, **INK_MODEL_POSTPROC)

        return detect

    return DET_KEY, load


def tiny_conv_recognizer(weights_path: str | None = None) -> ModelLoader:
    """(key, loader) for the matched-filter conv recognizer; drop-in for
    the ``recognizer=`` seam of ``extract_turns``."""
    path = weights_path or WEIGHTS_PATH

    def load():
        from ..functions.vocabs import FONT
        from ..operators.recognition import ctc_best_path

        w = _load_weights(path)
        vocab = str(w["vocab"])
        if vocab != FONT:
            raise ValueError(f"{REC_KEY} weights vocab does not match FONT")
        filters = w["rec_w"].astype(np.float64)  # (V, 7, 5)
        bias = w["rec_b"].astype(np.float64)  # (V,)
        temp = float(w["rec_temp"])

        def recognize(crops: list[np.ndarray], scale: int) -> list[tuple[str, float]]:
            out = []
            for crop in crops:
                out.append(_recognize_crop(crop, scale))
            return out

        def _recognize_crop(crop: np.ndarray, scale: int) -> tuple[str, float]:
            # stride-s subsample to cell space (the crop comes from the
            # renderer's pixel grid; this is the model's fixed input
            # resolution, the analog of a CRNN's resize-to-32px preproc)
            cells = crop_cells(crop, scale)
            if cells is None:
                return ("", 0.0)
            evidence = glyph_evidence(cells, filters, bias)  # (T, V)
            logits = np.concatenate(
                [temp * evidence, np.zeros((evidence.shape[0], 1))], axis=1
            )  # blank channel logit 0
            return ctc_best_path(logits, vocab)[0]

        return recognize

    return REC_KEY, load
