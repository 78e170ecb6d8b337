"""Golden parity: fused moment sweep vs scipy.ndimage oracle (SURVEY.md §4.1).

Integer features must be exactly equal; float features bit-identical (the
exact-integer-moments contract, finalize.py docstring).
"""

import numpy as np
import pytest
import scipy.ndimage as nd

from tissue_analysis_tpu import analyze
from tissue_analysis_tpu.oracle import ScipyOracle

STACKS = ["small3d", "small3d_iso", "small2d", "cube", "slabs", "gapped"]


@pytest.fixture(params=STACKS)
def case(request):
    img = request.getfixturevalue(request.param)
    return img, analyze(img, background=1), ScipyOracle(img, background=1)


def test_label_ids_match_unique(case):
    img, table, oracle = case
    np.testing.assert_array_equal(np.sort(table.ids), oracle.labels)


def test_volume_exact(case):
    img, table, oracle = case
    ref = oracle.volume(real=False)
    for k, l in enumerate(table.ids):
        assert table.count[k] == int(ref[int(l)]), f"label {l}"
    # Σ volumes = image size (property test, SURVEY.md §4.2)
    assert table.count.sum() == np.asarray(img).size


def test_volume_real_bitmatch(case):
    img, table, oracle = case
    ref = oracle.volume(real=True)
    got = table.volume(real=True)
    for k, l in enumerate(table.ids):
        assert got[k] == ref[int(l)], f"label {l}"


def test_barycenter_bitmatch_scipy(case):
    """Voxel-space barycenter bit-matches nd.center_of_mass (SURVEY.md §0.1)."""
    img, table, oracle = case
    ref = oracle.barycenter(real=False)
    got = table.barycenter(real=False)
    for k, l in enumerate(table.ids):
        assert np.array_equal(got[k], ref[int(l)]), f"label {l}"


def test_barycenter_real_bitmatch(case):
    img, table, oracle = case
    ref = oracle.barycenter(real=True)
    got = table.barycenter(real=True)
    for k, l in enumerate(table.ids):
        assert np.array_equal(got[k], ref[int(l)]), f"label {l}"


def test_boundingbox_exact(case):
    img, table, oracle = case
    ref = oracle.boundingbox()
    got = table.bounding_slices()
    for k, l in enumerate(table.ids):
        r = ref[int(l)]
        if r is None:
            continue  # find_objects can't address labels outside 1..max
        assert got[k] == r, f"label {l}"


def test_integer_moments_exact(case):
    img, table, oracle = case
    count, s1, s2, cmin, cmax = oracle.integer_moments()
    order = np.argsort(table.ids)
    np.testing.assert_array_equal(table.count[order], count)
    np.testing.assert_array_equal(table.s1[order], s1)
    np.testing.assert_array_equal(table.s2[order], s2)
    np.testing.assert_array_equal(table.cmin[order], cmin)
    np.testing.assert_array_equal(table.cmax[order], cmax)


def test_find_objects_one_indexed_none_semantics():
    """Pin the nd.find_objects quirk the facade must preserve (§7 hard part 6)."""
    img = np.zeros((4, 4), dtype=np.int32)
    img[0, 0] = 1
    img[2, 2] = 3
    objs = nd.find_objects(img)
    assert len(objs) == 3 and objs[1] is None
    assert objs[0] == (slice(0, 1), slice(0, 1))
