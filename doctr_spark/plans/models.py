"""Pluggable model stage for the fused extraction pipeline.

The reference's predictors are model-agnostic — ``detection/zoo.py:59-71``
and ``recognition/zoo.py:41-52`` accept any custom model instance, and
SURVEY.md §4.4 specifies a per-executor weight lifecycle. This module is
the Spark-native equivalent: the pipeline consumes a detector and a
recognizer through two small contracts, resolved from zero-arg *loader*
callables via a per-worker lazy singleton, so real NN weights (torch /
ONNX) load ONCE per Python worker process — with
``spark.python.worker.reuse`` (default on) that is once per executor core,
no matter how many Arrow batches or tasks the worker handles.

Contracts (all numpy, no framework types cross the boundary):

- detector:   ``(page: (H, W) uint8, scale: int) -> (N, 5) float64``
  relative ``[xmin, ymin, xmax, ymax, conf]`` boxes (the
  DetectionPredictor output shape, reference models/detection/zoo.py).
- recognizer: ``(crops: list[(h, w) uint8], scale: int) ->
  list[(text, conf)]`` — batch-first so a real CRNN can stack the crops
  into one forward pass (reference models/recognition/predictor runs
  batched inference; the deterministic default just loops).

Defaults are the deterministic stand-ins (ink-fuse detector,
glyph-matcher recognizer). A real DBNet/CRNN drops in as::

    def load_dbnet():
        sess = onnxruntime.InferenceSession("/weights/dbnet.onnx")
        def detect(page, scale):
            proba = sess.run(...)[0]
            return postprocess_proba_map(proba)  # existing postproc ops
        return detect

    extract_turns(df, detector=("dbnet-v1", load_dbnet))
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

# per-PROCESS model cache: lives in each Python worker; keys are stable
# strings so re-deserialized task closures hit the same entry
_WORKER_MODELS: dict[str, object] = {}

ModelLoader = tuple[str, Callable[[], Callable]]


def resolve_model(key: str, loader: Callable[[], Callable]):
    """Return the cached model for ``key``, loading it on first use in this
    process. Keyed by string (not object identity) because Spark
    re-deserializes the UDF closure per task — the cache must survive
    that."""
    model = _WORKER_MODELS.get(key)
    if model is None:
        model = loader()
        _WORKER_MODELS[key] = model
    return model


def clear_model_cache() -> None:
    """Testing hook: drop cached models in THIS process (workers keep
    theirs until they exit)."""
    _WORKER_MODELS.clear()


# ------------------------------------------------- deterministic defaults


def _load_ink_detector() -> Callable:
    """Deterministic detector: the ink-fuse proba-map pipeline
    (operators/detection.py), same role as the reference's synthetic-map
    unit-test models."""
    from ..operators.detection import ink_word_boxes

    def detect(page: np.ndarray, scale: int) -> np.ndarray:
        return ink_word_boxes(page, scale)

    return detect


def _load_glyph_recognizer() -> Callable:
    """Deterministic recognizer: glyph features -> logits -> CTC best-path
    (plays the CNN+BiLSTM feature stage of CRNN)."""
    from ..functions.vocabs import FONT, encode_string
    from ..operators.recognition import ctc_best_path, indices_to_logits
    from ..sources.font import read_word_crop

    # encode+CTC on a decoded string is a pure function of that string;
    # memoizing it per worker skips re-running the decode math for every
    # repeated word (bounded cache — corpora have Zipfian word frequency,
    # so the hit rate is high at any scale and the cache stays small)
    ctc_memo: dict[str, tuple[str, float]] = {}

    def _ctc_for(raw: str) -> tuple[str, float]:
        hit = ctc_memo.get(raw)
        if hit is None:
            try:
                indices = encode_string(raw, FONT)
            except ValueError:
                hit = (raw, 0.0)
            else:
                hit = ctc_best_path(indices_to_logits(indices), FONT)[0]
            if len(ctc_memo) < 65536:
                ctc_memo[raw] = hit
        return hit

    def recognize(crops: list[np.ndarray], scale: int) -> list[tuple[str, float]]:
        return [_ctc_for(read_word_crop(crop, scale)) for crop in crops]

    return recognize


def _make_parallel_recognizer_loader(conf_mode: str) -> Callable[[], Callable]:
    """Recognizer with the PARALLEL-decode (non-CTC) postprocessor family:
    attention/ViT-style heads emit one logit row per character position
    over ``vocab + [<eos>, <sos>]`` and decode by per-position argmax up
    to <eos> — no blank channel, no repeat collapse. ``conf_mode`` picks
    the reference confidence semantics: "mean" = ViTSTR
    (recognition/vitstr/pytorch.py:155-180), "min" = SAR/MASTER
    (recognition/sar/pytorch.py:309-333). The deterministic glyph head
    plays the encoder exactly as the CTC default does; the decode path is
    the real reference postprocessor re-derived in numpy
    (operators/recognition.py: eos_decode)."""

    def load() -> Callable:
        from ..functions.vocabs import FONT, encode_string
        from ..operators.recognition import eos_decode, indices_to_eos_logits
        from ..sources.font import read_word_crop

        memo: dict[str, tuple[str, float]] = {}

        def _decode_for(raw: str) -> tuple[str, float]:
            hit = memo.get(raw)
            if hit is None:
                try:
                    indices = encode_string(raw, FONT)
                except ValueError:
                    hit = (raw, 0.0)
                else:
                    hit = eos_decode(indices_to_eos_logits(indices), FONT, conf=conf_mode)[0]
                if len(memo) < 65536:
                    memo[raw] = hit
            return hit

        def recognize(crops: list[np.ndarray], scale: int) -> list[tuple[str, float]]:
            return [_decode_for(read_word_crop(crop, scale)) for crop in crops]

        return recognize

    return load


VITSTR_RECOGNIZER: ModelLoader = ("glyph-vitstr-v1", _make_parallel_recognizer_loader("mean"))
SAR_RECOGNIZER: ModelLoader = ("glyph-sar-v1", _make_parallel_recognizer_loader("min"))


def _load_glyph_orientation() -> Callable:
    """Deterministic orientation classifier: glyph-hit score over the 4
    quarter turns (the OrientationPredictor contract —
    ``(page, scale) -> k`` where k is the ccw quarter-turn count that
    uprights the page)."""
    from ..operators.orientation import estimate_page_orientation

    def orient(page: np.ndarray, scale: int) -> int:
        return estimate_page_orientation(page, scale)

    return orient


DEFAULT_DETECTOR: ModelLoader = ("ink-fuse-default", _load_ink_detector)
DEFAULT_RECOGNIZER: ModelLoader = ("glyph-ctc-default", _load_glyph_recognizer)
DEFAULT_ORIENTATION: ModelLoader = ("glyph-orient-default", _load_glyph_orientation)


# ------------------------------------------------- real-NN loader factories


def _onnx_session(model_path: str):
    """Open an ONNX model: onnxruntime when installed, else the bundled
    pure-numpy executor (plans/onnx_exec.NumpySession) — same file format,
    same run() surface, so the loader contract executes in both worlds."""
    try:
        import onnxruntime as ort

        return ort.InferenceSession(model_path)
    except ImportError:
        from .onnx_exec import NumpySession

        return NumpySession(model_path)


def onnx_detector(
    model_path: str,
    input_name: str = "input",
    postproc: dict | None = None,
    target_hw: tuple[int, int] | None = None,
) -> ModelLoader:
    """Loader for a real DBNet-style ONNX detection head: the session
    loads once per worker (via resolve_model), each call preprocesses the
    page (optional resize + [0,1] normalize, NCHW), runs the forward pass
    for the (H, W) proba map, and reuses this module's DB postprocessor
    (binarize -> 3x3 open -> components -> score -> unclip -> relative
    boxes) — the exact composition the reference's DetectionPredictor runs
    (preprocess + model + DetectionPostProcessor). Uses onnxruntime when
    installed; otherwise the same .onnx file executes through the bundled
    pure-numpy ONNX executor (plans/onnx_exec.py — a 20-op real-exporter
    set: conv/pool/norm/resize/merge ops plus the classifier head and
    the MobileNet elementwise activations), so the serialized-checkpoint
    load path runs either way.
    """
    from ..operators.detection import DB_POSTPROC, postprocess_proba_map
    from ..operators.preprocess import remove_padding, resize_page

    pp = dict(DB_POSTPROC if postproc is None else postproc)
    key = f"onnx-det:{model_path}"

    def load():
        sess = _onnx_session(model_path)

        def detect(page: np.ndarray, scale: int) -> np.ndarray:
            img, tf = (
                resize_page(page, target_hw, preserve_aspect_ratio=True, symmetric_pad=True)
                if target_hw is not None
                else (page, (0.0, 0.0, 1.0, 1.0))
            )
            x = (img.astype(np.float32) / 255.0)[None, None, :, :]  # NCHW gray
            proba = np.asarray(sess.run(None, {input_name: x})[0]).reshape(img.shape)
            boxes = postprocess_proba_map(proba, **pp)
            if target_hw is not None and len(boxes):
                boxes = np.concatenate(
                    [remove_padding(boxes[:, :4], tf), boxes[:, 4:5]], axis=1
                )
            return boxes

        return detect

    return key, load


def onnx_recognizer(model_path: str, vocab: str | None = None, input_name: str = "input") -> ModelLoader:
    """Loader for a CRNN-style ONNX recognition head: session loads once
    per worker; each call stacks the crop batch (resized to the model's
    fixed height is the caller's preprocessing contract), runs one forward
    for (N, T, vocab+1) logits, and decodes with this module's CTC
    best-path (argmax, run-collapse, blank=len(vocab), conf = min
    max-softmax) — the reference RecognitionPredictor composition."""
    from ..functions.vocabs import FONT
    from ..operators.recognition import ctc_best_path

    voc = FONT if vocab is None else vocab
    key = f"onnx-reco:{model_path}"

    def load():
        sess = _onnx_session(model_path)

        def recognize(crops: list[np.ndarray], scale: int) -> list[tuple[str, float]]:
            if not crops:
                return []
            h = max(c.shape[0] for c in crops)
            w = max(c.shape[1] for c in crops)
            batch = np.full((len(crops), 1, h, w), 1.0, dtype=np.float32)
            for i, c in enumerate(crops):
                batch[i, 0, : c.shape[0], : c.shape[1]] = c.astype(np.float32) / 255.0
            logits = np.asarray(sess.run(None, {input_name: batch})[0])  # (N, T, V+1)
            return ctc_best_path(logits, voc)  # batch decode in one pass

        return recognize

    return key, load
