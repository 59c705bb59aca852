"""The fused per-turn extraction pipeline.

Topology (cf. SURVEY.md §3.1's Spark lifecycle): parquet/Iceberg scan ->
[optional salted repartition] -> ONE Arrow-batched ``mapInPandas`` stage
that routes each turn by payload kind and runs the full extraction chain
in-process (decode -> detect -> crop -> recognize(CTC) -> build -> render,
or DOM-strip for HTML, or identity for plain text) -> window-ordered
output.

Fusing the det/reco/build stages into a single UDF is the deliberate
scale choice: page images dwarf the text they produce, so they must never
cross a shuffle boundary — only (conv_id, turn_idx, extracted_text, words,
metrics) leave the stage. Catalyst handles column pruning into the scan
(only the 6 input columns are read) and AQE handles post-stage exchanges.

Skew: heavy per-row work is independent across turns, so parallelism comes
from parquet input splits (maxPartitionBytes), NOT from a key shuffle; a
single 10^5-turn conversation therefore spreads over many tasks naturally.
``salt_partitions`` forces an explicit even re-spread by (conv_id,
turn_idx) hash for pathological file layouts (few huge row groups).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.html import extract_main_text, looks_like_html
from ..operators.builder import build_page
from ..operators.geometry import extract_crops
from ..sources.payloads import decode_page_bundle, parse_tool_envelope
from .models import (
    DEFAULT_DETECTOR,
    DEFAULT_ORIENTATION,
    DEFAULT_RECOGNIZER,
    ModelLoader,
    resolve_model,
)

EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, role string, ts timestamp, payload_kind string, "
    "extracted_text string, n_pages int, n_boxes int, n_artefacts int, n_chars int, "
    "strip_ratio double, min_conf double, "
    "words array<struct<value:string, confidence:double, xmin:double, "
    "ymin:double, xmax:double, ymax:double, page_idx:int, line_idx:int, word_idx:int>>, "
    "artefacts array<struct<type:string, confidence:double, xmin:double, "
    "ymin:double, xmax:double, ymax:double, page_idx:int>>, "
    "error string"
)

# KIE route (reference models/kie_predictor): the same fused stage also
# emits per-class flat prediction lists + the KIEDocument render
EXTRACT_KIE_SCHEMA = EXTRACT_SCHEMA + (
    ", predictions map<string, array<struct<value:string, confidence:double, "
    "xmin:double, ymin:double, xmax:double, ymax:double, page_idx:int>>>, "
    "kie_text string"
)

# a detected region is a non-text artefact when the ink fill of its
# TRIMMED ink bbox exceeds the threshold AND the region is larger than a
# couple of glyphs: the densest possible font words ('BBB', '###') trim
# to exactly 60/133 = 0.451 fill (OCR-bank words <= 0.39) while bar/QR/
# halftone patterns sit at >= 0.5 and solids at 1.0 — 0.475 splits the
# measured gap. The area floor (in font cells, x scale^2 px) keeps one-
# and two-glyph dense words ('#' trims to 0.57) on the text path. Typed
# classification of gated regions lives in operators/artefacts.py (the
# deterministic stand-in for the reference's ONNX ArtefactDetector
# plugin, contrib/artefacts.py).
ARTEFACT_FILL_THRESH = 0.475
ARTEFACT_MIN_AREA_CELLS = 100

PAGE_SEP = "\n\n\n\n"


def extract_turn_ocr(
    bundle: bytes,
    detect_orientation: bool = False,
    detection_hooks: list | None = None,
    detector=None,
    recognizer=None,
    orienter=None,
    straighten_pages: bool = False,
    kie: bool = False,
) -> tuple:
    """Decode a page bundle and run [orient ->] detect -> [hooks ->] crop ->
    recognize -> build per page.

    Returns (document_text, n_pages, n_boxes, n_artefacts, min_conf, words,
    artefacts) — artefacts are the typed non-text nodes (reference
    io/elements.py:109-138): they carry geometry/type/confidence, render as
    [TYPE] via functions/export.artefact_render, and never contribute to
    the extracted text.
    ``detect_orientation`` mirrors docTR's optional orientation stage
    (default off = the assume_straight_pages fast path).
    ``detection_hooks``: callables (boxes:(N,5)) -> (N,5) applied to the
    detector output before cropping — the predictor add_hook() extension
    point (reference models/predictor/base.py:193-199).
    ``detector`` / ``recognizer``: resolved model instances following the
    plans/models.py contracts (default: the deterministic kernels) — the
    model-agnostic seam matching reference detection/zoo.py:59-71 /
    recognition/zoo.py:41-52 custom-model injection.
    """
    pages, scale = decode_page_bundle(bundle)
    return extract_pages_ocr(
        pages, scale, detect_orientation, detection_hooks, detector, recognizer, orienter,
        straighten_pages=straighten_pages, kie=kie,
    )


def extract_pages_ocr(
    pages: list[np.ndarray],
    scale: int,
    detect_orientation: bool = False,
    detection_hooks: list | None = None,
    detector=None,
    recognizer=None,
    orienter=None,
    straighten_pages: bool = False,
    straighten_min_angle: float = 1.0,
    kie: bool = False,
) -> tuple:
    """OCR chain over already-decoded grayscale pages (the shared core of
    the bundle / PDF / image payload routes). ``orienter`` follows the
    OrientationPredictor contract ((page, scale) -> quarter turns); like
    detector/recognizer it is a pluggable model instance.

    ``straighten_pages`` mirrors the reference's non-straight path
    (models/predictor/base.py:91-113, predictor/pytorch.py:97-103): the
    fine skew angle is estimated from the page's merged text-line
    geometry (the seg-map analog of the first detection pass), the page
    is rotated by that float angle when it exceeds ``straighten_min_angle``
    degrees, and detection runs on the straightened page — the second
    pass. Geometry recovery is golden-tested; note that with the
    deterministic glyph-matcher recognizer, resampled glyphs decode
    exactly only when the cell grid survives (quarter turns); a real CRNN
    through the model seam is the tolerant path for float skews.

    ``kie``: the KIE predictor route (reference models/kie_predictor/
    pytorch.py:69-182) — the SAME det/reco chain, but each page's words go
    through the KIE builder (operators/kie.py: per-class flat Prediction
    lists, class lists in reading order) instead of only the Line/Block
    tree; the return tuple gains (predictions, kie_text) where
    ``predictions`` maps class -> [prediction dicts + page_idx] across
    pages and ``kie_text`` is the per-page KIE render joined by the page
    separator (KIEDocument.render semantics, io/elements.py:459-463)."""
    if detector is None:
        detector = resolve_model(*DEFAULT_DETECTOR)
    if recognizer is None:
        recognizer = resolve_model(*DEFAULT_RECOGNIZER)
    if orienter is None and detect_orientation:
        orienter = resolve_model(*DEFAULT_ORIENTATION)
    page_texts: list[str] = []
    words_out: list[dict] = []
    artefacts_out: list[dict] = []
    kie_preds: dict[str, list[dict]] = {}
    kie_page_texts: list[str] = []
    n_boxes = 0
    n_artefacts = 0
    min_conf = 1.0
    for page_idx, img in enumerate(pages):
        if detect_orientation:
            from ..operators.orientation import rotate_page

            img = rotate_page(img, orienter(img, scale))
        if straighten_pages:
            from ..operators.orientation import estimate_skew_angle, rotate_page_float

            angle = estimate_skew_angle(img, scale)
            if abs(angle) >= straighten_min_angle:
                img = rotate_page_float(img, angle)
        boxes = detector(img, scale)
        for hook in detection_hooks or ():
            boxes = hook(boxes)
        crops = extract_crops(img, boxes[:, :4])
        # zero-size drop + artefact split (solid non-text regions skip
        # recognition and, like the reference's Artefact nodes, do not
        # contribute to the rendered text)
        keep = []
        for i, c in enumerate(crops):
            if c.size == 0:
                continue
            c_ink = c < 128
            # trim extents via axis any()+argmax (no index-array allocation
            # over the crop — this check runs once per detected region and
            # showed up in the extraction profile via np.nonzero)
            rows_any = c_ink.any(axis=1)
            if rows_any.any():
                cols_any = c_ink.any(axis=0)
                th = len(rows_any) - int(rows_any.argmax()) - int(rows_any[::-1].argmax())
                tw = len(cols_any) - int(cols_any.argmax()) - int(cols_any[::-1].argmax())
                area = th * tw
                fill = float(c_ink.sum()) / area
                big = area > ARTEFACT_MIN_AREA_CELLS * scale * scale
            else:
                fill, big = 0.0, False
            if fill > ARTEFACT_FILL_THRESH and big:
                from ..operators.artefacts import classify_artefact

                a_type, a_conf = classify_artefact(c)
                n_artefacts += 1
                artefacts_out.append(
                    {
                        "type": a_type,
                        "confidence": a_conf,
                        "xmin": float(boxes[i, 0]),
                        "ymin": float(boxes[i, 1]),
                        "xmax": float(boxes[i, 2]),
                        "ymax": float(boxes[i, 3]),
                        "page_idx": page_idx,
                    }
                )
                continue
            keep.append(i)
        boxes = boxes[keep]
        preds = recognizer([crops[i] for i in keep], scale)
        values = [p[0] for p in preds]
        confs = np.array([p[1] for p in preds]) if preds else np.zeros(0)
        built = build_page(boxes[:, :4], values, boxes[:, 4])
        page_texts.append(built.text)
        n_boxes += len(values)
        if confs.size:
            min_conf = min(min_conf, float(confs.min()))
        for w in built.words:
            w["page_idx"] = page_idx
            words_out.append(w)
        if kie:
            from ..operators.kie import build_kie_page, render_kie_page

            page_preds = build_kie_page(
                boxes[:, :4], values, confs if confs.size else None
            )
            kie_page_texts.append(render_kie_page(page_preds))
            for cls, cls_preds in page_preds.items():
                for p in cls_preds:
                    p["page_idx"] = page_idx
                kie_preds.setdefault(cls, []).extend(cls_preds)
    base = (
        PAGE_SEP.join(page_texts), len(pages), n_boxes, n_artefacts, min_conf,
        words_out, artefacts_out,
    )
    if kie:
        return base + (kie_preds, PAGE_SEP.join(kie_page_texts))
    return base


def _extract_batch(
    pdf: pd.DataFrame,
    detect_orientation: bool = False,
    detector=None,
    recognizer=None,
    orienter=None,
    error_policy: str = "capture",
    straighten_pages: bool = False,
    kie: bool = False,
) -> pd.DataFrame:
    out_rows = []
    for conv_id, turn_idx, role, text, tool, ts in zip(
        pdf["conv_id"], pdf["turn_idx"], pdf["role"], pdf["text"], pdf["tool"], pdf["ts"]
    ):
        payload = parse_tool_envelope(tool) if tool else None
        words: list[dict] = []
        artefacts: list[dict] = []
        error = None
        predictions: dict[str, list[dict]] = {}
        kie_text = ""
        n_pages, n_boxes, n_artefacts, min_conf, strip_ratio = 0, 0, 0, 1.0, 1.0
        try:
            kind, extracted = _route_turn(
                payload, text, detect_orientation, detector, recognizer, orienter,
                straighten_pages=straighten_pages, kie=kie,
            )
        except Exception as exc:  # noqa: BLE001 — per-turn quarantine
            # a corrupt payload must not kill a 10^12-turn job: quarantine
            # the row (kind='error', empty text, bounded message) so the
            # sidecar metrics surface the failure rate and a re-run can
            # filter to the quarantined keys. error_policy='raise' keeps
            # strict tests/debug semantics.
            if error_policy != "capture":
                raise
            kind, extracted = "error", ""
            error = f"{type(exc).__name__}: {exc}"[:500]
            words, artefacts = [], []
            n_pages = n_boxes = n_artefacts = 0
            min_conf, strip_ratio = 0.0, 1.0
        else:
            if kind == "ocr":
                if kie:
                    (
                        extracted, n_pages, n_boxes, n_artefacts, min_conf,
                        words, artefacts, predictions, kie_text,
                    ) = extracted
                else:
                    extracted, n_pages, n_boxes, n_artefacts, min_conf, words, artefacts = extracted
            elif kind == "html":
                strip_ratio = (len(extracted) / len(text)) if len(text) else 1.0
        out_rows.append(
            _turn_row(
                conv_id, turn_idx, role, ts, kind, extracted, n_pages, n_boxes,
                n_artefacts, strip_ratio, min_conf, words, artefacts, error,
                predictions=predictions if kie else None,
                kie_text=kie_text if kie else None,
            )
        )
    columns = _ROW_COLUMNS + ["predictions", "kie_text"] if kie else _ROW_COLUMNS
    return pd.DataFrame(out_rows, columns=columns)


def _route_turn(payload, text, detect_orientation, detector, recognizer, orienter=None, straighten_pages=False, kie=False):
    """Dispatch one turn by payload kind; returns (kind, result) where the
    'ocr' result is the extract tuple and html/plain results are text."""
    if payload is not None and payload[0] == "page_bundle":
        return "ocr", extract_turn_ocr(
            payload[1], detect_orientation,
            detector=detector, recognizer=recognizer, orienter=orienter,
            straighten_pages=straighten_pages, kie=kie,
        )
    if payload is not None and payload[0] in ("pdf", "image"):
        # real-world payloads: rasterize/decode (env-gated libs), fold
        # to grayscale, then the same OCR chain
        from ..sources.font import DEFAULT_SCALE
        from ..sources.payloads import read_image, read_pdf_pages, to_grayscale

        raw_pages = (
            read_pdf_pages(payload[1]) if payload[0] == "pdf" else [read_image(payload[1])]
        )
        return "ocr", extract_pages_ocr(
            [to_grayscale(p) for p in raw_pages],
            DEFAULT_SCALE,
            detect_orientation,
            detector=detector,
            recognizer=recognizer,
            orienter=orienter,
            straighten_pages=straighten_pages,
            kie=kie,
        )
    if text and looks_like_html(text):
        return "html", extract_main_text(text)
    return "plain", text or ""


_ROW_COLUMNS = [
    "conv_id", "turn_idx", "role", "ts", "payload_kind", "extracted_text",
    "n_pages", "n_boxes", "n_artefacts", "n_chars", "strip_ratio", "min_conf",
    "words", "artefacts", "error",
]


def _turn_row(
    conv_id, turn_idx, role, ts, kind, extracted, n_pages, n_boxes,
    n_artefacts, strip_ratio, min_conf, words, artefacts, error,
    predictions=None, kie_text=None,
):
    row = {
        "conv_id": conv_id,
        "turn_idx": turn_idx,
        "role": role,
        "ts": ts,
        "payload_kind": kind,
        "extracted_text": extracted,
        "n_pages": n_pages,
        "n_boxes": n_boxes,
        "n_artefacts": n_artefacts,
        "n_chars": len(extracted),
        "strip_ratio": float(strip_ratio),
        "min_conf": float(min_conf),
        "words": [
            (
                w["value"], w["confidence"], w["xmin"], w["ymin"], w["xmax"],
                w["ymax"], w.get("page_idx", 0), w["line_idx"], w["word_idx"],
            )
            for w in words
        ],
        "artefacts": [
            (
                a["type"], a["confidence"], a["xmin"], a["ymin"],
                a["xmax"], a["ymax"], a["page_idx"],
            )
            for a in artefacts
        ],
        "error": error,
    }
    if predictions is not None or kie_text is not None:
        row["predictions"] = {
            cls: [
                (
                    p["value"], p["confidence"], p["xmin"], p["ymin"],
                    p["xmax"], p["ymax"], p["page_idx"],
                )
                for p in preds
            ]
            for cls, preds in (predictions or {}).items()
        }
        row["kie_text"] = kie_text or ""
    return row


def extract_turns(
    df: DataFrame,
    salt_partitions: int | None = None,
    detect_orientation: bool = False,
    detector: ModelLoader | None = None,
    recognizer: ModelLoader | None = None,
    orienter: ModelLoader | None = None,
    error_policy: str = "capture",
    straighten_pages: bool = False,
    kie: bool = False,
) -> DataFrame:
    """Fused extraction over a transcript DataFrame.

    ``salt_partitions``: optional explicit re-spread by (conv_id, turn_idx)
    hash before the heavy stage — only needed when the input file layout is
    pathologically skewed; the shuffle moves payload bytes, so default off.
    ``detect_orientation``: enable the per-page orientation classifier
    (docTR's non-assume_straight_pages path; ~2-4x detection cost).
    ``detector`` / ``recognizer``: ``(cache_key, loader)`` pairs for custom
    models (plans/models.py contracts). The loader runs lazily ONCE per
    Python worker process — real NN weights load per executor core, not per
    task or batch (SURVEY.md §4.4 lifecycle) — and the resolved model
    serves every subsequent batch that worker handles.
    ``error_policy``: 'capture' (default) quarantines per-turn decode/OCR
    failures as payload_kind='error' rows with the message in the ``error``
    column — one corrupt payload in 10^12 turns must not fail the job;
    'raise' propagates (strict/debug).
    ``straighten_pages``: estimate each page's float skew angle from its
    merged line geometry and re-run detection on the de-skewed page
    (reference predictor straighten_pages path; see extract_pages_ocr).
    ``kie``: the kie_predictor entry point (reference models/
    kie_predictor/pytorch.py:69-182) — the output gains ``predictions``
    (map class -> reading-ordered Prediction structs, per-class detection
    head semantics via the KIE builder) and ``kie_text`` (the KIEDocument
    render). Same fused single-stage plan: page bytes still never cross a
    shuffle; only the extra slim map column leaves the stage.
    """
    src = df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    if salt_partitions:
        src = src.repartition(salt_partitions, F.xxhash64("conv_id", "turn_idx"))
    det_key, det_loader = detector or DEFAULT_DETECTOR
    rec_key, rec_loader = recognizer or DEFAULT_RECOGNIZER
    orient_key, orient_loader = orienter or DEFAULT_ORIENTATION

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        det = resolve_model(det_key, det_loader)
        rec = resolve_model(rec_key, rec_loader)
        ori = resolve_model(orient_key, orient_loader) if detect_orientation else None
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(
                    pdf, detect_orientation, detector=det, recognizer=rec,
                    orienter=ori, error_policy=error_policy,
                    straighten_pages=straighten_pages, kie=kie,
                )

    return src.mapInPandas(run, schema=EXTRACT_KIE_SCHEMA if kie else EXTRACT_SCHEMA)


def ordered_turns(extracted: DataFrame) -> DataFrame:
    """Stable per-conversation ordering: never rely on row order after a
    shuffle — materialize the (conv_id, turn_idx) rank explicitly."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_rank", F.row_number().over(w))


def conversation_documents(extracted: DataFrame) -> DataFrame:
    """Collapse a conversation's turns into one document string (turns joined
    in turn_idx order by the page separator) + rollup metrics."""
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx").alias("o"), F.col("extracted_text").alias("v")))
    )
    return (
        extracted.groupBy("conv_id")
        .agg(
            F.array_join(F.transform(pairs, lambda s: s["v"]), PAGE_SEP).alias("document_text"),
            F.count("*").alias("n_turns"),
            F.sum("n_boxes").alias("n_boxes"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
