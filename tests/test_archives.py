"""Public-benchmark archive loaders (sources/archives.py) against mocked
archives — the same strategy the reference's own tests use
(tests/conftest.py:113-783 builds zip mocks; no network): zip layout,
per-image annotation parsing, box-conversion parity, empty-text drop,
comma-label rejoin, and the no-shuffle Spark plan shape."""

from __future__ import annotations

import json
import shutil

import pytest

from doctr_spark.sources.archives import (
    extract_archive,
    load_cord,
    load_funsd,
    load_sroie,
    parse_cord_annotation,
    parse_funsd_annotation,
    parse_sroie_annotation,
)

FUNSD_ANN = {
    "form": [
        {"text": "TOTAL:", "label": "question", "id": 0, "linking": [],
         "words": [{"box": [10, 20, 58, 32], "text": "TOTAL:"}]},
        {"text": "42.50 EUR", "label": "answer", "id": 1, "linking": [],
         "words": [{"box": [64, 20, 104, 32], "text": "42.50"},
                   {"box": [110, 20, 128, 32], "text": "EUR"}]},
        {"text": "", "label": "other", "id": 2, "linking": [],
         "words": [{"box": [10, 40, 30, 52], "text": ""}]},
    ]
}

CORD_ANN = {
    "dontcare": [],
    "valid_line": [
        {"category": "menu.nm", "group_id": 1,
         "words": [{"text": "LATTE",
                    "quad": {"x1": 100, "y1": 50, "x2": 160, "y2": 52,
                             "x3": 158, "y3": 70, "x4": 98, "y4": 68}}]},
        {"category": "menu.price", "group_id": 2,
         "words": [{"text": "4.00",
                    "quad": {"x1": 200, "y1": 50, "x2": 240, "y2": 50,
                             "x3": 240, "y3": 70, "x4": 200, "y4": 70}},
                   {"text": "",
                    "quad": {"x1": 246, "y1": 50, "x2": 280, "y2": 50,
                             "x3": 280, "y3": 70, "x4": 246, "y4": 70}}]},
    ],
}

SROIE_ANN = (
    "12,30,180,30,180,60,12,60,ACME STORE\n"
    "20,70,120,75,118,95,18,90,RECEIPT,NO,7\n"
    "30,110,90,110,90,130,30,130,9.99\n"
)


def _build_funsd_zip(tmp_path):
    root = tmp_path / "funsd_src"
    sub = root / "dataset" / "training_data"
    (sub / "images").mkdir(parents=True)
    (sub / "annotations").mkdir(parents=True)
    for i in range(2):
        (sub / "images" / f"{i}.png").write_bytes(b"\x89PNG-funsd" + bytes([i]))
        (sub / "annotations" / f"{i}.json").write_text(json.dumps(FUNSD_ANN))
    return shutil.make_archive(str(tmp_path / "funsd"), "zip", str(root))


def _build_cord_zip(tmp_path):
    root = tmp_path / "cord_src"
    (root / "image").mkdir(parents=True)
    (root / "json").mkdir(parents=True)
    for i in range(2):
        (root / "image" / f"r{i}.png").write_bytes(b"\x89PNG-cord" + bytes([i]))
        (root / "json" / f"r{i}.json").write_text(json.dumps(CORD_ANN))
    return shutil.make_archive(str(tmp_path / "cord_train"), "zip", str(root))


def _build_sroie_zip(tmp_path):
    root = tmp_path / "sroie_src"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir(parents=True)
    for i in range(2):
        (root / "images" / f"{i}.jpg").write_bytes(b"\xff\xd8-sroie" + bytes([i]))
        (root / "annotations" / f"{i}.txt").write_text(SROIE_ANN, encoding="latin-1")
    return shutil.make_archive(str(tmp_path / "sroie2019_train_task1"), "zip", str(root))


# ------------------------------------------------------------- pure parsers


def test_funsd_parse_straight_and_polygons_and_empty_drop():
    geoms, labels = parse_funsd_annotation(FUNSD_ANN)
    assert labels == ["TOTAL:", "42.50", "EUR"]  # empty-text word dropped
    assert geoms[0] == [10.0, 20.0, 58.0, 32.0]
    pg, _ = parse_funsd_annotation(FUNSD_ANN, use_polygons=True)
    # box -> tl, tr, br, bl corners (funsd.py:92-100)
    assert pg[0] == [10.0, 20.0, 58.0, 20.0, 58.0, 32.0, 10.0, 32.0]


def test_cord_parse_quad_reduction_and_corner_order():
    geoms, labels = parse_cord_annotation(CORD_ANN)
    assert labels == ["LATTE", "4.00"]
    # min/max reduction over the 4 quad points (cord.py:107)
    assert geoms[0] == [98.0, 50.0, 160.0, 70.0]
    pg, _ = parse_cord_annotation(CORD_ANN, use_polygons=True)
    assert pg[0] == [100.0, 50.0, 160.0, 52.0, 158.0, 70.0, 98.0, 68.0]


def test_sroie_parse_comma_labels_and_quad_reduction():
    geoms, labels = parse_sroie_annotation(SROIE_ANN)
    # the label tail rejoins on commas (sroie.py:92)
    assert labels == ["ACME STORE", "RECEIPT,NO,7", "9.99"]
    # skewed quad reduces to per-axis min/max (sroie.py:97-100)
    assert geoms[1] == [18.0, 70.0, 120.0, 95.0]
    pg, _ = parse_sroie_annotation(SROIE_ANN, use_polygons=True)
    assert pg[1] == [20.0, 70.0, 120.0, 75.0, 118.0, 95.0, 18.0, 90.0]


# ------------------------------------------------------------ spark loaders


def test_funsd_loader_end_to_end(spark, tmp_path):
    zp = _build_funsd_zip(tmp_path)
    root = extract_archive(zp, str(tmp_path / "x"))
    df = load_funsd(spark, root, train=True)
    rows = {r["img_name"]: r for r in df.collect()}
    assert set(rows) == {"0.png", "1.png"}
    assert rows["0.png"]["labels"] == ["TOTAL:", "42.50", "EUR"]
    assert rows["0.png"]["geoms"][1] == [64.0, 20.0, 104.0, 32.0]
    assert bytes(rows["1.png"]["image"]) == b"\x89PNG-funsd\x01"
    # extraction is idempotent
    assert extract_archive(zp, str(tmp_path / "x")) == root


def test_cord_and_sroie_loaders_end_to_end(spark, tmp_path):
    cord_root = extract_archive(_build_cord_zip(tmp_path), str(tmp_path / "c"))
    df = load_cord(spark, cord_root, use_polygons=True)
    r = {x["img_name"]: x for x in df.collect()}["r0.png"]
    assert r["labels"] == ["LATTE", "4.00"]
    assert r["geoms"][0] == [100.0, 50.0, 160.0, 52.0, 158.0, 70.0, 98.0, 68.0]

    sroie_root = extract_archive(_build_sroie_zip(tmp_path), str(tmp_path / "s"))
    df = load_sroie(spark, sroie_root)
    r = {x["img_name"]: x for x in df.collect()}["1.jpg"]
    assert r["labels"] == ["ACME STORE", "RECEIPT,NO,7", "9.99"]
    assert len(r["geoms"]) == 3 and all(len(g) == 4 for g in r["geoms"])


def test_missing_annotation_raises(spark, tmp_path):
    zp = _build_funsd_zip(tmp_path)
    root = extract_archive(zp, str(tmp_path / "m"))
    import os

    os.remove(os.path.join(root, "dataset", "training_data", "annotations", "1.json"))
    with pytest.raises(FileNotFoundError):
        load_funsd(spark, root, train=True)


def test_archive_loader_plan_has_no_exchange(spark, tmp_path):
    """Image bytes never shuffle: the plan is binaryFile scan ->
    mapInPandas broadcast attach, no Exchange (same guarantee
    sources/datasets.py pins)."""
    root = extract_archive(_build_sroie_zip(tmp_path), str(tmp_path / "p"))
    df = load_sroie(spark, root)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in plan
