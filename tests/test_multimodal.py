"""Multimodal binary-column operators over page bundles."""

import numpy as np
import pytest

from doctr_spark.operators.multimodal import (
    decode_image_real,
    frame_sample,
    page_bundle_metadata,
    page_pixel_stats,
)
from doctr_spark.sources.payloads import encode_page_bundle


@pytest.fixture(scope="module")
def bundles(spark):
    rows = []
    for i in range(4):
        pages = [np.full((20 + 10 * p, 30), 255, np.uint8) for p in range(i + 1)]
        for p in pages:
            p[5:10, 5:15] = 0  # some ink
        rows.append((i, bytearray(encode_page_bundle(pages, scale=2))))
    return spark.createDataFrame(rows, "id long, payload binary")


def test_bundle_metadata(spark, bundles):
    out = {r["id"]: r for r in page_bundle_metadata(bundles, "id", "payload").collect()}
    assert out[0]["n_pages"] == 1 and out[3]["n_pages"] == 4
    assert out[3]["heights"] == [20, 30, 40, 50]
    assert all(r["scale"] == 2 for r in out.values())


def test_pixel_stats_explode(spark, bundles):
    out = page_pixel_stats(bundles, "id", "payload")
    assert out.count() == 1 + 2 + 3 + 4  # one row per page
    r = out.filter("id = 0 and page_idx = 0").collect()[0]
    assert r["height"] == 20 and r["width"] == 30
    assert abs(r["ink_ratio"] - 50 / 600) < 1e-9


def test_frame_sample(spark, bundles):
    out = frame_sample(bundles, "id", "payload", every_k=2)
    got = {(r["id"], r["page_idx"]) for r in out.collect()}
    assert (3, 0) in got and (3, 2) in got and (3, 1) not in got


def test_real_decoder_gated():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff")


def test_dhash_and_page_dhash(spark):
    import numpy as np

    from doctr_spark.operators.multimodal import dhash64, page_dhash
    from doctr_spark.sources.font import render_page
    from doctr_spark.sources.payloads import encode_page_bundle

    a, _ = render_page(["SAME", "PAGE", "42"], scale=3)
    b, _ = render_page(["SAME", "PAGE", "42"], scale=3)
    c, _ = render_page(["COMPLETELY", "DIFFERENT", "CONTENT", "NOW"], scale=3)
    assert dhash64(a) == dhash64(b)  # identical renders collide exactly
    diff = bin(dhash64(a) ^ dhash64(c)).count("1")
    assert diff >= 8  # unrelated pages far apart

    df = spark.createDataFrame(
        [(1, bytearray(encode_page_bundle([a, c], 3)))], "row_id long, payload binary"
    )
    out = {(r["id"], r["page_idx"]): r["dhash"] for r in page_dhash(df, "row_id", "payload").collect()}
    assert out[(1, 0)] == np.int64(np.uint64(dhash64(a)))
    assert len(out) == 2


def test_pcm_rms_windows(spark):
    import numpy as np

    from doctr_spark.operators.multimodal import pcm_rms_windows

    sr = 1000
    # 1.5 s: constant amplitude 1000 then silence
    pcm = np.concatenate([np.full(sr, 1000, dtype="<i2"), np.zeros(sr // 2, dtype="<i2")])
    df = spark.createDataFrame([(7, bytearray(pcm.tobytes()))], "clip_id long, payload binary")
    out = {r["window_idx"]: r for r in pcm_rms_windows(df, "clip_id", "payload", sample_rate=sr, window_ms=500).collect()}
    assert len(out) == 3
    assert out[0]["rms"] == 1000.0 and out[1]["rms"] == 1000.0
    assert out[2]["rms"] == 0.0 and out[2]["n_samples"] == 500
