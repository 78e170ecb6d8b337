"""Native C++ relabel vs the numpy reference path — bit-identical contract."""

import numpy as np
import pytest

from tissue_analysis_tpu import native


def _numpy_relabel(arr, background):
    ids, dense = np.unique(arr, return_inverse=True)
    ids = ids.astype(np.int64)
    dense = dense.reshape(arr.shape).astype(np.int32)
    bg_seg = None
    if background is not None:
        pos = np.searchsorted(ids, background)
        if pos < ids.shape[0] and ids[pos] == background:
            if pos != 0:
                remap = np.arange(ids.shape[0], dtype=np.int32)
                remap[0], remap[pos] = pos, 0
                dense = remap[dense]
                ids = ids.copy()
                ids[0], ids[pos] = ids[pos], ids[0]
            bg_seg = 0
    return dense, ids, bg_seg


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@requires_native
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.int32, np.int64])
@pytest.mark.parametrize("background", [None, 1, 7, 99])
def test_relabel_matches_numpy(dtype, background):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 40, size=(13, 17, 19)).astype(dtype) * 3 + 1
    got = native.relabel(arr, background)
    assert got is not None
    dense, ids, bg = got
    exp_dense, exp_ids, exp_bg = _numpy_relabel(arr, background)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_array_equal(dense, exp_dense)
    assert bg == exp_bg


@requires_native
def test_relabel_2d_and_gapped_ids():
    arr = np.array([[5, 5, 900], [900, 101, 5]], dtype=np.int64)
    dense, ids, bg = native.relabel(arr, None)
    exp_dense, exp_ids, exp_bg = _numpy_relabel(arr, None)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_array_equal(dense, exp_dense)
    assert bg is exp_bg


@requires_native
def test_relabel_many_labels_grows_table():
    # >2^12 distinct labels exercises the per-thread hash rebuild
    arr = (np.arange(100_000, dtype=np.int64) % 9001) * 17 + 3
    dense, ids, bg = native.relabel(arr.reshape(100, 1000), 3)
    exp_dense, exp_ids, exp_bg = _numpy_relabel(arr.reshape(100, 1000), 3)
    np.testing.assert_array_equal(ids, exp_ids)
    np.testing.assert_array_equal(dense, exp_dense)
    assert bg == exp_bg == 0
