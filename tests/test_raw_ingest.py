"""On-device ingest (raw mode) parity: `analyze_raw` must be BIT-IDENTICAL
to the relabel path `analyze` (VERDICT r2 item 2 — end-to-end device-bound
ingest). Reference: the ingest stage is implicit in every reference method
(`spatial_image_analysis.py :: AbstractSpatialImageAnalysis.__init__`
keeps the raw image; per-label work uses original ids).
"""

import numpy as np
import pytest

from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.engine import analyze, analyze_raw

FIELDS = (
    "ids", "count", "s1", "s2", "cmin", "cmax",
    "pair_lo", "pair_hi", "wall_face_counts", "margin",
)


def assert_tables_equal(a, b):
    assert a.shape == b.shape
    assert a.voxelsize == b.voxelsize
    assert a.background_segment == b.background_segment
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def test_raw_matches_relabel_voronoi():
    img = np.asarray(voronoi_stack((32, 40, 48), 60, seed=3))
    assert_tables_equal(
        analyze_raw(img, background=1), analyze(img, background=1)
    )


def test_raw_sparse_ids_background_absent():
    # absent ids inside the range; background value not in the image
    img = np.zeros((8, 8, 8), dtype=np.int32)
    img[:4] = 3
    img[4:, :4] = 700
    img[4:, 4:] = 65
    ta = analyze_raw(img, background=1)
    tb = analyze(img, background=1)
    assert ta.background_segment is None
    assert_tables_equal(ta, tb)


def test_raw_background_not_smallest():
    # background=5 must be swapped to segment 0 in both paths
    img = np.full((8, 8, 8), 5, dtype=np.uint16)
    img[2:6, 2:6, 2:6] = 2
    img[3:5, 3:5, 3:5] = 9
    ta = analyze_raw(img, background=5)
    tb = analyze(img, background=5)
    assert ta.background_segment == 0
    assert ta.ids[0] == 5
    assert_tables_equal(ta, tb)


def test_raw_uint8_input():
    rng = np.random.default_rng(0)
    img = rng.integers(1, 7, size=(10, 12, 14), dtype=np.uint8)
    assert_tables_equal(
        analyze_raw(img, background=1), analyze(img, background=1)
    )


def test_raw_negative_labels_fall_back():
    img = np.full((6, 6, 6), -1, dtype=np.int32)
    img[:3] = 4
    assert_tables_equal(
        analyze_raw(img, background=None), analyze(img, background=None)
    )


def test_raw_huge_id_falls_back():
    img = np.full((6, 6, 6), 1, dtype=np.int32)
    img[:3] = 1 << 21  # >= max_raw_id default
    assert_tables_equal(
        analyze_raw(img, background=1), analyze(img, background=1)
    )


def test_raw_2d_falls_back():
    rng = np.random.default_rng(1)
    img = rng.integers(1, 9, size=(24, 32), dtype=np.int32)
    assert_tables_equal(
        analyze_raw(img, background=1), analyze(img, background=1)
    )


def test_raw_facade_roundtrip():
    # the compacted table serves the facade exactly like the relabel one
    from tissue_analysis_tpu.features.table import FeatureTable

    img = np.asarray(voronoi_stack((24, 24, 24), 30, seed=9))
    t = analyze_raw(img, background=1)
    assert isinstance(t, FeatureTable)
    adj = t.adjacency()
    assert set(adj) == set(t.ids.tolist())
    v = t.volume(real=False)
    assert int(v.sum()) == img.size


def test_raw_float_dtype_rejected():
    with pytest.raises(TypeError):
        analyze_raw(np.zeros((4, 4, 4), dtype=np.float32))
