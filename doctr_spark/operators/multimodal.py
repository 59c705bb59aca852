"""Multimodal column operators: opaque binary payloads + typed metadata.

Pattern: image/audio/video payloads live in BinaryType columns; plan-level
code only sees schema'd metadata; pixel/byte work happens inside
Arrow-batched UDFs. Real codec decoding (JPEG/PNG/audio) is stubbed behind
import-tries (the libs are not in this container) — the Spark-side
plumbing (schemas, batching, explode shapes) is real and tested against
the deterministic page-bundle format.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.payloads import bundle_meta, decode_page_bundle

BUNDLE_META_SCHEMA = "id long, n_pages int, scale int, heights array<int>, widths array<int>, n_bytes long"


def page_bundle_metadata(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Parse typed metadata out of page-bundle binary columns (header-only,
    no pixel decompression)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                m = bundle_meta(bytes(blob))
                rows.append(
                    {
                        "id": i,
                        "n_pages": m["n_pages"],
                        "scale": m["scale"],
                        "heights": [h for h, _ in m["dims"]],
                        "widths": [w for _, w in m["dims"]],
                        "n_bytes": m["n_bytes"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, schema=BUNDLE_META_SCHEMA)


PIXEL_STATS_SCHEMA = "id long, page_idx int, height int, width int, ink_ratio double, mean_intensity double"


def page_pixel_stats(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Per-page feature extraction (explode: one input row -> n_pages rows).
    The deterministic stand-in for an image feature extractor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                pages, _ = decode_page_bundle(bytes(blob))
                for p_idx, img in enumerate(pages):
                    rows.append(
                        {
                            "id": i,
                            "page_idx": p_idx,
                            "height": img.shape[0],
                            "width": img.shape[1],
                            "ink_ratio": float((img < 128).mean()),
                            "mean_intensity": float(img.mean()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str, every_k: int = 2) -> DataFrame:
    """Sample every k-th page of each bundle (video frame-sampling analog);
    emits (id, page_idx, height, width) for the kept frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[payload_col]):
                m = bundle_meta(bytes(blob))
                for p_idx, (h, w) in enumerate(m["dims"]):
                    if p_idx % every_k == 0:
                        rows.append({"id": i, "page_idx": p_idx, "height": h, "width": w})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, schema="id long, page_idx int, height int, width int")


def decode_image_real(img_bytes: bytes) -> np.ndarray:  # pragma: no cover - env-gated
    """Real image decode path (cv2), stubbed in this container."""
    try:
        import cv2
    except ImportError as exc:
        raise NotImplementedError("cv2 not installed: real image decode unavailable") from exc
    arr = np.frombuffer(img_bytes, dtype=np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)
