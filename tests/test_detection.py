"""Detection postprocessor goldens on synthetic proba maps (style of the
reference's tests/common/test_models_detection.py)."""

import numpy as np
import pytest

from doctr_spark.operators.detection import (
    binary_open3,
    bitmap_to_boxes,
    box_score,
    connected_components,
    postprocess_proba_map,
    unclip_box,
)
from doctr_spark.operators.geometry import box_iou_matrix, nms


def _map_with_rects(h, w, rects, fg=0.9, bg=0.05):
    m = np.full((h, w), bg)
    for x0, y0, x1, y1 in rects:
        m[y0:y1, x0:x1] = fg
    return m


def test_connected_components_basic():
    bm = np.zeros((20, 40), dtype=np.uint8)
    bm[2:8, 3:13] = 1
    bm[12:18, 20:35] = 1
    comps = connected_components(bm)
    assert comps == [(3, 2, 12, 7), (20, 12, 34, 17)]


def test_connected_components_diagonal_touch():
    bm = np.zeros((4, 4), dtype=np.uint8)
    bm[0, 0] = 1
    bm[1, 1] = 1  # 8-connectivity joins diagonals
    comps = connected_components(bm)
    assert len(comps) == 1


def test_opening_removes_speckle():
    bm = np.zeros((10, 10), dtype=np.uint8)
    bm[5, 5] = 1  # single pixel
    bm[1:5, 1:5] = 1  # 4x4 block survives
    opened = binary_open3(bm)
    assert opened[5, 5] == 0
    assert opened[2, 2] == 1


def test_box_score_mean():
    pred = np.zeros((10, 10))
    pred[2:5, 2:5] = 1.0
    assert box_score(pred, 2, 2, 4, 4) == 1.0
    assert box_score(pred, 0, 0, 9, 9) == pytest.approx(9 / 100)


def test_unclip_expansion():
    # 10x10 box at (5,5)-(14,14): d = 100*1.5/(2*20) = 3.75
    x0, y0, x1, y1 = unclip_box(5, 5, 14, 14, 1.5)
    assert (x0, y0) == (1, 1)  # floor(5-3.75)
    assert (x1, y1) == (18, 18)  # ceil(14+3.75)


def test_two_rects_detected():
    proba = _map_with_rects(100, 200, [(10, 10, 60, 30), (100, 50, 180, 80)])
    boxes = postprocess_proba_map(proba)
    assert boxes.shape == (2, 5)
    # scores = mean over expanded bbox region > box_thresh
    assert (boxes[:, 4] > 0.1).all()
    # first rect: ink region [10,60)x[10,30) must be inside the detected box
    b0 = boxes[np.argsort(boxes[:, 0])][0]
    assert b0[0] <= 10 / 200 and b0[2] >= 60 / 200
    assert b0[1] <= 10 / 100 and b0[3] >= 30 / 100


def test_small_component_dropped():
    proba = _map_with_rects(50, 50, [(10, 10, 12, 12)])  # 2x2 -> extent 1 < 2
    boxes = postprocess_proba_map(proba)
    assert boxes.shape[0] == 0


def test_low_score_dropped():
    proba = _map_with_rects(50, 50, [(5, 5, 30, 30)], fg=0.35)
    # passes bin_thresh 0.3 but a high box_thresh filters it
    boxes = postprocess_proba_map(proba, box_thresh=0.9)
    assert boxes.shape[0] == 0


def test_boxes_clipped_to_unit():
    proba = _map_with_rects(40, 40, [(0, 0, 30, 30)])
    boxes = postprocess_proba_map(proba)
    assert (boxes[:, :4] >= 0).all() and (boxes[:, :4] <= 1).all()


def test_iou_and_nms():
    a = np.array([[0, 0, 1, 1]])
    b = np.array([[0.5, 0.5, 1.5, 1.5], [2, 2, 3, 3]])
    iou = box_iou_matrix(a, b)
    assert iou[0, 0] == pytest.approx(0.25 / 1.75)
    assert iou[0, 1] == 0.0
    stack = np.array([[0, 0, 1, 1, 0.9], [0.05, 0.05, 1.05, 1.05, 0.8], [2, 2, 3, 3, 0.7]])
    keep = nms(stack, thresh=0.5)
    assert keep == [0, 2]


def test_bitmap_to_boxes_scores_from_pred():
    pred = _map_with_rects(60, 60, [(10, 10, 40, 40)], fg=0.8)
    bitmap = (pred >= 0.3).astype(np.uint8)
    boxes = bitmap_to_boxes(pred, bitmap)
    assert boxes.shape[0] == 1
    assert boxes[0, 4] == pytest.approx(0.8, abs=1e-6)


def test_postproc_presets():
    from doctr_spark.operators.detection import DB_POSTPROC, FAST_POSTPROC, LINKNET_POSTPROC

    proba = _map_with_rects(100, 200, [(10, 10, 60, 30)], fg=0.2)
    # visible to FAST thresholds (bin .1) but below DB's bin_thresh .3
    assert postprocess_proba_map(proba, **FAST_POSTPROC).shape[0] == 1
    assert postprocess_proba_map(proba, **DB_POSTPROC).shape[0] == 0
    assert LINKNET_POSTPROC["unclip_ratio"] == 1.0


def test_polygon_iou_values():
    from doctr_spark.operators.geometry import polygon_iou

    sq = lambda x0, y0, x1, y1: [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
    A = np.asarray([sq(0, 0, 2, 2)], dtype=np.float64)
    B = np.asarray([sq(1, 0, 3, 2), sq(0, 0, 2, 2), sq(5, 5, 6, 6)], dtype=np.float64)
    out = polygon_iou(A, B)
    assert out.shape == (1, 3)
    np.testing.assert_allclose(out[0], [1 / 3, 1.0, 0.0], atol=1e-12)
    # rotated diamond inscribed in the square: inter = diamond area = 2
    D = np.asarray([[[1, 0], [2, 1], [1, 2], [0, 1]]], dtype=np.float64)
    np.testing.assert_allclose(polygon_iou(A, D), [[0.5]], atol=1e-12)
    # orientation-invariant (clockwise inputs)
    np.testing.assert_allclose(polygon_iou(A, D[:, ::-1, :]), [[0.5]], atol=1e-12)
    np.testing.assert_allclose(polygon_iou(D[:, ::-1, :], A), [[0.5]], atol=1e-12)
    # matches the straight-box IoU on axis-aligned quads
    straight = polygon_iou(A, B)
    from doctr_spark.operators.geometry import box_iou_matrix

    boxes_a = np.asarray([[0, 0, 2, 2]], dtype=np.float64)
    boxes_b = np.asarray([[1, 0, 3, 2], [0, 0, 2, 2], [5, 5, 6, 6]], dtype=np.float64)
    np.testing.assert_allclose(straight, box_iou_matrix(boxes_a, boxes_b), atol=1e-12)


def test_fast_reparameterize_output_equivalence():
    """The fused single conv reproduces the 4-branch FAST layer's output
    exactly (pre-activation): relu(bn(conv3x3) + bn(conv3x1) + bn(conv1x3)
    + bn_id(x)) == relu(conv_fused(x) + bias) — the reference
    reparameterize contract (models/modules/layers/pytorch.py:141-230),
    verified numerically."""
    import numpy as np

    from doctr_spark.operators.reparam import (
        batchnorm,
        conv2d_same,
        reparameterize_fast_layer,
    )

    rng = np.random.default_rng(5)
    C = 4  # in == out so the identity branch is active

    def rand_bn():
        return {
            "gamma": rng.standard_normal(C),
            "beta": rng.standard_normal(C),
            "mean": rng.standard_normal(C),
            "var": rng.uniform(0.5, 2.0, C),
            "eps": 1e-5,
        }

    k_main = rng.standard_normal((C, C, 3, 3))
    k_ver = rng.standard_normal((C, C, 3, 1))
    k_hor = rng.standard_normal((C, C, 1, 3))
    bn_main, bn_ver, bn_hor, bn_id = rand_bn(), rand_bn(), rand_bn(), rand_bn()

    x = rng.standard_normal((2, C, 7, 9))
    unfused = (
        batchnorm(conv2d_same(x, k_main), bn_main)
        + batchnorm(conv2d_same(x, k_ver), bn_ver)
        + batchnorm(conv2d_same(x, k_hor), bn_hor)
        + batchnorm(x, bn_id)
    )
    kernel, bias = reparameterize_fast_layer(
        k_main, bn_main, k_ver, bn_ver, k_hor, bn_hor, id_bn=bn_id
    )
    fused = conv2d_same(x, kernel, bias)
    assert np.allclose(np.maximum(unfused, 0), np.maximum(fused, 0), atol=1e-9)


def test_fast_reparameterize_partial_branches():
    import numpy as np

    from doctr_spark.operators.reparam import (
        batchnorm,
        conv2d_same,
        fuse_conv_bn,
        reparameterize_fast_layer,
    )

    rng = np.random.default_rng(6)
    bn = {
        "gamma": rng.standard_normal(3),
        "beta": rng.standard_normal(3),
        "mean": rng.standard_normal(3),
        "var": rng.uniform(0.5, 2.0, 3),
        "eps": 1e-5,
    }
    k = rng.standard_normal((3, 2, 3, 3))  # out != in: no identity branch
    x = rng.standard_normal((1, 2, 5, 5))
    kernel, bias = reparameterize_fast_layer(k, bn)
    assert np.allclose(batchnorm(conv2d_same(x, k), bn), conv2d_same(x, kernel, bias), atol=1e-9)
    kf, bf = fuse_conv_bn(k, bn)
    assert np.allclose(kernel, kf) and np.allclose(bias, bf)


def test_cell_fast_path_bit_equal_to_full_res():
    """ink_word_boxes' cell-space fast path (s-aligned pooling + cell-unit
    dilation + cell-space components) returns boxes BIT-IDENTICAL — scores
    included — to the full-resolution dilation path, on pages and all
    quarter-turn rotations; a 1px-shifted (non-aligned) page falls back to
    the full-resolution path and still matches it exactly."""
    from doctr_spark.operators.detection import (
        _ink_cells_if_aligned,
        bitmap_to_boxes,
        dilate_horizontal,
        dilate_vertical,
        ink_word_boxes,
    )
    from doctr_spark.sources.font import DEFAULT_SCALE, render_page

    def full_res(page):
        ink = (page < 128).astype(np.uint8)
        fused = dilate_horizontal(dilate_vertical(ink, 4 * DEFAULT_SCALE), 3 * DEFAULT_SCALE)
        return bitmap_to_boxes(
            None, fused, box_thresh=0.1, unclip_ratio=0.2,
            score_mask=fused, levels=(0.02, 0.98),
        )

    for words in (["HELLO", "WORLD"], ["A+B=C", "R&D", "#1"], ["WHY?", "GO!", "KILO"]):
        img, _ = render_page(words, scale=DEFAULT_SCALE)
        # upright pages are s-aligned and take the fast path
        assert _ink_cells_if_aligned((img < 128).astype(np.uint8), DEFAULT_SCALE) is not None
        for k in range(4):
            # rotations of a 640-wide page break alignment (640 % 3 != 0)
            # and exercise the fallback; either way boxes are identical
            pg = np.rot90(img, k)
            assert np.array_equal(ink_word_boxes(pg, DEFAULT_SCALE), full_res(pg))
    # 1px shift breaks cell alignment -> exact full-res fallback
    img, _ = render_page(["HELLO", "WORLD"], scale=DEFAULT_SCALE)
    shifted = np.full_like(img, 255)
    shifted[:, 1:] = img[:, :-1]
    assert _ink_cells_if_aligned((shifted < 128).astype(np.uint8), DEFAULT_SCALE) is None
    assert np.array_equal(ink_word_boxes(shifted, DEFAULT_SCALE), full_res(shifted))
