"""Spark readers for docTR's custom-data dataset formats
(sources/datasets.py; reference datasets/{detection,recognition,ocr}.py).
Fixtures are synthetic label files + opaque image bytes — the readers
never decode image content (that is the env-gated payload layer's job)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from doctr_spark.sources.datasets import (
    CLASS_NAME,
    load_detection_dataset,
    load_ocr_dataset,
    load_recognition_dataset,
)

POLY_A = [[10.0, 20.0], [50.0, 18.0], [52.0, 40.0], [12.0, 42.0]]
POLY_B = [[60.0, 20.0], [90.0, 20.0], [90.0, 44.0], [60.0, 44.0]]


@pytest.fixture()
def dataset_dir(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    (img_dir / "a.png").write_bytes(b"\x89PNG-fake-a" * 10)
    (img_dir / "b.png").write_bytes(b"\x89PNG-fake-bb" * 20)
    return tmp_path


def test_detection_dataset_single_class(spark, dataset_dir):
    labels = {
        "a.png": {"polygons": [POLY_A, POLY_B]},
        "b.png": {"polygons": [POLY_A]},
    }
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps(labels))
    df = load_detection_dataset(spark, str(dataset_dir / "images"), str(lp))
    rows = {r["img_name"]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    # straight-box reduction == reference min/max over the 4 points
    assert rows["a.png"]["geoms"] == [[10.0, 18.0, 52.0, 42.0], [60.0, 20.0, 90.0, 44.0]]
    assert rows["a.png"]["classes"] == [CLASS_NAME, CLASS_NAME]
    assert rows["a.png"]["n_bytes"] == len(b"\x89PNG-fake-a" * 10)
    assert bytes(rows["b.png"]["image"]).startswith(b"\x89PNG-fake-bb")


def test_detection_dataset_multiclass_and_polygons(spark, dataset_dir):
    labels = {"a.png": {"polygons": {"title": [POLY_A], "body": [POLY_B]}}}
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps(labels))
    df = load_detection_dataset(
        spark, str(dataset_dir / "images"), str(lp), use_polygons=True
    )
    r = df.collect()[0]
    assert r["classes"] == ["title", "body"]
    # polygons kept as 8 corner coords
    assert r["geoms"][0] == [10.0, 20.0, 50.0, 18.0, 52.0, 40.0, 12.0, 42.0]


def test_recognition_dataset(spark, dataset_dir):
    labels = {"a.png": "HELLO", "b.png": "WORLD"}
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps(labels))
    df = load_recognition_dataset(spark, str(dataset_dir / "images"), str(lp))
    got = {r["img_name"]: r["label"] for r in df.collect()}
    assert got == labels


def test_ocr_dataset_and_empty_images(spark, dataset_dir):
    labels = {
        "a.png": {
            "typed_words": [
                {"geometry": [1.0, 2.0, 3.0, 4.0], "value": "HI"},
                {"geometry": [5.0, 6.0, 7.0, 8.0], "value": "YO"},
            ]
        },
        "b.png": {"typed_words": []},  # empty image (ocr.py:55-58)
    }
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps(labels))
    df = load_ocr_dataset(spark, str(dataset_dir / "images"), str(lp))
    rows = {r["img_name"]: r for r in df.collect()}
    assert rows["a.png"]["boxes"] == [[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]]
    assert rows["a.png"]["labels"] == ["HI", "YO"]
    assert rows["b.png"]["boxes"] == [] and rows["b.png"]["labels"] == []


def test_missing_image_raises(spark, dataset_dir):
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps({"nope.png": "X"}))
    with pytest.raises(FileNotFoundError, match="nope.png"):
        load_recognition_dataset(spark, str(dataset_dir / "images"), str(lp))
    with pytest.raises(FileNotFoundError, match="unable to locate"):
        load_recognition_dataset(
            spark, str(dataset_dir / "images"), str(dataset_dir / "absent.json")
        )


def test_detection_dataset_bad_polygons_type(spark, dataset_dir):
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps({"a.png": {"polygons": "oops"}}))
    with pytest.raises(TypeError, match="polygons should be"):
        load_detection_dataset(spark, str(dataset_dir / "images"), str(lp))


def test_image_bytes_never_shuffle(spark, dataset_dir):
    """Plan guard: the binary scan feeds the projection directly — no
    Exchange between the image source and the label attach."""
    labels = {"a.png": "HELLO"}
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps(labels))
    df = load_recognition_dataset(spark, str(dataset_dir / "images"), str(lp))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan


def test_unlabeled_files_are_not_loaded(spark, dataset_dir):
    """Only labeled images appear (the scan loads explicit paths, so a
    folder full of unlabeled files costs no I/O and no rows)."""
    (dataset_dir / "images" / "unlabeled.png").write_bytes(b"zzz" * 1000)
    lp = dataset_dir / "labels.json"
    lp.write_text(json.dumps({"a.png": "ONLY"}))
    df = load_recognition_dataset(spark, str(dataset_dir / "images"), str(lp))
    assert [r["img_name"] for r in df.collect()] == ["a.png"]
