"""Dataset loaders for docTR's OWN custom-data formats, Spark-first —
the three the reference defines for user fine-tuning data (the
public-benchmark archive loaders FUNSD/CORD/SROIE live in
sources/archives.py and share this module's scan+broadcast plan; the
remaining 10 archive formats stay out of scope — the driver supplies
parquet tables for benchmarks):

- DetectionDataset   (datasets/detection.py:20-96):
    labels.json = {img_name: {"polygons": [[(x,y) x4], ...]            # single-class
                              |  {class_name: [[(x,y) x4], ...]}}}     # multi-class
- RecognitionDataset (datasets/recognition.py:16-47):
    labels.json = {img_name: "transcription"}
- OCRDataset         (datasets/ocr.py:14-80):
    labels.json = {img_name: {"typed_words": [{"geometry": [x0,y0,x1,y1],
                                               "value": str}, ...]}}

Spark shape: images load through the ``binaryFile`` source (split-parallel
scan, content stays an opaque binary column — decode is the env-gated
payload layer's job, sources/payloads.py), and the label map rides as a
BROADCAST python dict applied in a mapInPandas projection — annotations
are kilobytes per image while image bytes dominate, so only the scan
parallelizes and no shuffle ever moves image content.

Geometry parity with the reference: straight boxes are 4 doubles
(xmin, ymin, xmax, ymax) reduced from polygons exactly like
DetectionDataset.format_polygons (min/max over the 4 points);
``use_polygons=True`` keeps the 4 corner points as 8 doubles
(x0,y0,...,x3,y3). Missing image files raise FileNotFoundError at load,
matching the reference's existence check.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference file_utils.CLASS_NAME — the implicit class of single-class
# detection labels
CLASS_NAME = "words"


def _read_labels(label_path: str) -> dict:
    if not os.path.exists(label_path):
        raise FileNotFoundError(f"unable to locate {label_path}")
    with open(label_path, "rb") as fh:
        return json.load(fh)


def _images_df(spark: SparkSession, img_folder: str, names: list[str]) -> DataFrame:
    """binaryFile scan of EXACTLY the labeled images (explicit path list,
    so unlabeled files in the folder are never read — a basename filter
    after a folder-wide load would scan every file's bytes first), with
    the reference's existence check."""
    missing = [n for n in names if not os.path.exists(os.path.join(img_folder, n))]
    if missing:
        raise FileNotFoundError(
            f"unable to locate {os.path.join(img_folder, missing[0])}"
            + (f" (+{len(missing) - 1} more)" if len(missing) > 1 else "")
        )
    paths = [os.path.join(img_folder, n) for n in names]
    return (
        spark.read.format("binaryFile")
        .load(paths)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("img_name"),
            F.col("content").alias("image"),
            F.col("length").alias("n_bytes"),
        )
    )


def _attach_broadcast_columns(
    spark: SparkSession, imgs: DataFrame, values: dict, cols: list[str], schema_suffix: str
) -> DataFrame:
    """Project broadcast per-image annotation columns onto the binary scan
    (one mapInPandas, no exchange; shared by all three loaders).
    ``values`` maps img_name -> tuple aligned with ``cols``."""
    b = spark.sparkContext.broadcast(values)

    def attach(batches):
        for pdf in batches:
            pdf = pdf.copy()
            for i, col in enumerate(cols):
                pdf[col] = [
                    b.value[n][i] if isinstance(b.value[n], tuple) else b.value[n]
                    for n in pdf["img_name"]
                ]
            yield pdf

    return imgs.mapInPandas(
        attach, schema="img_name string, image binary, n_bytes long, " + schema_suffix
    )


def _format_polygons(label, use_polygons: bool) -> tuple[list[list[float]], list[str]]:
    """DetectionDataset.format_polygons parity (detection.py:66-92)."""
    polygons = label["polygons"]
    if isinstance(polygons, list):
        classes = [CLASS_NAME for _ in polygons]
        arrs = [np.asarray(p, dtype=np.float64) for p in polygons]
    elif isinstance(polygons, dict):
        classes = [k for k, v in polygons.items() for _ in v]
        arrs = [np.asarray(p, dtype=np.float64) for v in polygons.values() for p in v]
    else:
        raise TypeError(f"polygons should be a dictionary or list, it was {type(polygons)}")
    geoms = []
    for a in arrs:
        if use_polygons:
            geoms.append([float(x) for x in a.reshape(-1)])  # 8 corner coords
        else:
            geoms.append(
                [float(a[:, 0].min()), float(a[:, 1].min()), float(a[:, 0].max()), float(a[:, 1].max())]
            )
    return geoms, classes


def load_detection_dataset(
    spark: SparkSession, img_folder: str, label_path: str, use_polygons: bool = False
) -> DataFrame:
    """(img_name, image, n_bytes, geoms array<array<double>>,
    classes array<string>) — DetectionDataset as a DataFrame."""
    labels = _read_labels(label_path)
    parsed = {
        name: _format_polygons(label, use_polygons) for name, label in labels.items()
    }
    imgs = _images_df(spark, img_folder, list(parsed))
    return _attach_broadcast_columns(
        spark, imgs, parsed, ["geoms", "classes"],
        "geoms array<array<double>>, classes array<string>",
    )


def load_recognition_dataset(
    spark: SparkSession, img_folder: str, labels_path: str
) -> DataFrame:
    """(img_name, image, n_bytes, label) — RecognitionDataset as a DataFrame."""
    labels = _read_labels(labels_path)
    imgs = _images_df(spark, img_folder, list(labels))
    return _attach_broadcast_columns(
        spark, imgs, dict(labels), ["label"], "label string"
    )


def load_ocr_dataset(
    spark: SparkSession, img_folder: str, label_file: str, use_polygons: bool = False
) -> DataFrame:
    """(img_name, image, n_bytes, boxes array<array<double>>,
    labels array<string>) — OCRDataset as a DataFrame. Empty
    typed_words yield empty arrays (ocr.py:55-58)."""
    raw = _read_labels(label_file)
    parsed = {}
    for name, annotations in raw.items():
        words = annotations.get("typed_words", [])
        geoms = [[float(v) for v in obj["geometry"][:4]] for obj in words]
        if use_polygons:
            geoms = [
                [g[0], g[1], g[2], g[1], g[2], g[3], g[0], g[3]] for g in geoms
            ]
        parsed[name] = (geoms, [obj["value"] for obj in words])
    imgs = _images_df(spark, img_folder, list(parsed))
    return _attach_broadcast_columns(
        spark, imgs, parsed, ["boxes", "labels"],
        "boxes array<array<double>>, labels array<string>",
    )
