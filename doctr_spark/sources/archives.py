"""Public-benchmark archive dataset loaders (FUNSD / CORD / SROIE),
Spark-first — the archive-parsing third of the reference's data API that
``sources/datasets.py`` left open.

Per-image annotation formats follow the reference loaders exactly:

- FUNSD (reference datasets/funsd.py:21-120): zip layout
  ``dataset/{training_data,testing_data}/{images,annotations}``; each
  ``annotations/<stem>.json`` holds ``{"form": [block]}`` where every
  block carries ``words: [{"text", "box": [xmin,ymin,xmax,ymax]}]`` —
  words with empty text are dropped, ``use_polygons`` expands the box to
  the 4 corner points (funsd.py:86-103).
- CORD (reference datasets/cord.py:20-120): zip layout
  ``{image,json}``; each ``json/<stem>.json`` holds ``valid_line`` lines
  of ``words: [{"text", "quad": {x1..x4, y1..y4}}]`` — the quad is kept
  as the 4 corners with ``use_polygons`` else reduced to
  ``[min(x), min(y), max(x), max(y)]`` (cord.py:94-110).
- SROIE (reference datasets/sroie.py:20-108): zip layout
  ``{images,annotations}``; each ``annotations/<stem>.txt`` is
  latin-encoded CSV whose rows are 8 corner ints then the label (which
  may itself contain commas — rejoined with ``",".join(row[8:])``,
  sroie.py:92); ``use_polygons`` keeps the (4,2) corners else reduces to
  per-axis min/max (sroie.py:97-100).

Spark shape — identical to sources/datasets.py: the archive extracts
once on the driver (the reference's VisionDataset download+extract step,
minus the network), image bytes enter through a ``binaryFile`` scan of
exactly the annotated files (split-parallel, content never shuffles),
and the parsed per-image (geoms, labels) ride as ONE broadcast dict
applied in a mapInPandas projection. Output schema for all three:
``(img_name, image binary, n_bytes, geoms array<array<double>>,
labels array<string>)`` with straight boxes as 4 doubles and polygons as
8 corner doubles.
"""

from __future__ import annotations

import csv
import io
import json
import os
import zipfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .datasets import _attach_broadcast_columns, _images_df

GEOM_SCHEMA = "geoms array<array<double>>, labels array<string>"


def extract_archive(archive_path: str, extract_root: str) -> str:
    """Extract a dataset zip (idempotent: skips when the marker exists).
    Plays VisionDataset's download_and_extract step (reference
    datasets/datasets/base.py) without the network."""
    marker = os.path.join(extract_root, ".extracted")
    if not os.path.exists(marker):
        os.makedirs(extract_root, exist_ok=True)
        with zipfile.ZipFile(archive_path) as zf:
            zf.extractall(extract_root)
        with open(marker, "w") as fh:
            fh.write(os.path.basename(archive_path))
    return extract_root


# ------------------------------------------------------------ annotation parsers


def parse_funsd_annotation(
    data: dict, use_polygons: bool = False
) -> tuple[list[list[float]], list[str]]:
    """FUNSD form JSON -> (geoms, labels); empty-text words dropped and
    the straight box optionally expanded to its 4 corners, exactly
    funsd.py:86-103."""
    geoms: list[list[float]] = []
    labels: list[str] = []
    for block in data["form"]:
        for word in block["words"]:
            if len(word["text"]) == 0:
                continue
            b = [float(v) for v in word["box"]]
            if use_polygons:
                geoms.append([b[0], b[1], b[2], b[1], b[2], b[3], b[0], b[3]])
            else:
                geoms.append(b)
            labels.append(word["text"])
    return geoms, labels


def parse_cord_annotation(
    data: dict, use_polygons: bool = False
) -> tuple[list[list[float]], list[str]]:
    """CORD valid_line JSON -> (geoms, labels); quad corners kept in the
    x1..x4 order with use_polygons else reduced to min/max
    (cord.py:94-110)."""
    geoms: list[list[float]] = []
    labels: list[str] = []
    for line in data["valid_line"]:
        for word in line["words"]:
            if len(word["text"]) == 0:
                continue
            q = word["quad"]
            xs = [float(q["x1"]), float(q["x2"]), float(q["x3"]), float(q["x4"])]
            ys = [float(q["y1"]), float(q["y2"]), float(q["y3"]), float(q["y4"])]
            if use_polygons:
                geoms.append(
                    [xs[0], ys[0], xs[1], ys[1], xs[2], ys[2], xs[3], ys[3]]
                )
            else:
                geoms.append([min(xs), min(ys), max(xs), max(ys)])
            labels.append(word["text"])
    return geoms, labels


def parse_sroie_annotation(
    text: str, use_polygons: bool = False
) -> tuple[list[list[float]], list[str]]:
    """SROIE CSV rows (8 corner ints, label tail possibly containing
    commas) -> (geoms, labels), sroie.py:88-100."""
    rows = [r for r in csv.reader(io.StringIO(text)) if len(r) > 0]
    geoms: list[list[float]] = []
    labels: list[str] = []
    for row in rows:
        coords = np.array([int(v) for v in row[:8]], dtype=np.float64).reshape(4, 2)
        if use_polygons:
            geoms.append([float(v) for v in coords.reshape(-1)])
        else:
            geoms.append(
                [
                    float(coords[:, 0].min()), float(coords[:, 1].min()),
                    float(coords[:, 0].max()), float(coords[:, 1].max()),
                ]
            )
        labels.append(",".join(row[8:]))
    return geoms, labels


# ------------------------------------------------------------------ loaders


def _load_archive_dataset(
    spark: SparkSession,
    img_folder: str,
    ann_folder: str,
    ann_suffix: str,
    parse,
    use_polygons: bool,
    encoding: str | None = None,
) -> DataFrame:
    """Shared scan+broadcast plan: list images, parse each one's sibling
    annotation on the driver (annotations are KBs; image bytes are the
    heavy side and stay in the binaryFile scan)."""
    if not os.path.isdir(img_folder):
        raise FileNotFoundError(f"unable to locate {img_folder}")
    parsed: dict[str, tuple[list[list[float]], list[str]]] = {}
    for img_name in sorted(os.listdir(img_folder)):
        stem = os.path.splitext(img_name)[0]
        ann_path = os.path.join(ann_folder, f"{stem}{ann_suffix}")
        if not os.path.exists(ann_path):
            raise FileNotFoundError(f"unable to locate {ann_path}")
        if ann_suffix == ".json":
            with open(ann_path, "rb") as fh:
                parsed[img_name] = parse(json.load(fh), use_polygons)
        else:
            with open(ann_path, encoding=encoding or "utf-8") as fh:
                parsed[img_name] = parse(fh.read(), use_polygons)
    imgs = _images_df(spark, img_folder, list(parsed))
    return _attach_broadcast_columns(
        spark, imgs, parsed, ["geoms", "labels"], GEOM_SCHEMA
    )


def load_funsd(
    spark: SparkSession, root: str, train: bool = True, use_polygons: bool = False
) -> DataFrame:
    """FUNSD extracted-archive root -> (img_name, image, n_bytes, geoms,
    labels). ``train`` picks training_data/testing_data (funsd.py:70)."""
    sub = os.path.join(root, "dataset", "training_data" if train else "testing_data")
    return _load_archive_dataset(
        spark, os.path.join(sub, "images"), os.path.join(sub, "annotations"),
        ".json", parse_funsd_annotation, use_polygons,
    )


def load_cord(
    spark: SparkSession, root: str, use_polygons: bool = False
) -> DataFrame:
    """CORD extracted-archive root (train and test ship as separate
    archives, cord.py:39-50) -> the shared dataset shape."""
    return _load_archive_dataset(
        spark, os.path.join(root, "image"), os.path.join(root, "json"),
        ".json", parse_cord_annotation, use_polygons,
    )


def load_sroie(
    spark: SparkSession, root: str, use_polygons: bool = False
) -> DataFrame:
    """SROIE extracted-archive root -> the shared dataset shape; the
    annotation files are latin-encoded (sroie.py:87)."""
    return _load_archive_dataset(
        spark, os.path.join(root, "images"), os.path.join(root, "annotations"),
        ".txt", parse_sroie_annotation, use_polygons, encoding="latin-1",
    )
