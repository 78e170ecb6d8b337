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


def test_eigh3_analytic_matches_lapack():
    """The analytic batched 3x3 eigensolver (finalize._eigh3) must satisfy the
    np.linalg.eigh contract at machine precision for every regime the
    inertia-tensor path can produce: generic SPD, anisotropic voxel scales,
    exactly/near-degenerate spectra, zero rows, and extreme magnitudes."""
    from tissue_analysis_tpu.features.finalize import _eigh3

    rng = np.random.default_rng(7)
    m = 2000
    X = rng.normal(size=(m, 30, 3)) * np.array([1e-3, 1.0, 1e2])
    spd = np.einsum("kni,knj->kij", X, X) / 30
    w0 = np.stack([np.ones(m), np.ones(m), 2 * np.ones(m)], axis=1)
    Q, _ = np.linalg.qr(rng.normal(size=(m, 3, 3)))
    degen = np.einsum("kia,ka,kja->kij", Q, w0, Q)
    sym = rng.normal(size=(m, 3, 3))
    sym = (sym + sym.transpose(0, 2, 1)) / 2
    for A in (spd, degen, sym, np.zeros((8, 3, 3)), degen * 1e150, spd * 1e-150):
        w, V = _eigh3(A.copy())
        scale = max(np.abs(A).max(), 1e-300)
        # eigenvalues ascending, matching LAPACK to machine precision
        assert np.all(np.diff(w, axis=1) >= -1e-12 * scale)
        # eigenvalue error is absolute in ||A|| (perturbation theory) — tiny
        # eigenvalues of ill-conditioned matrices carry no relative accuracy
        np.testing.assert_allclose(w, np.linalg.eigvalsh(A), rtol=0, atol=1e-10 * scale)
        # columns orthonormal, residual |A v - w v| at machine precision
        orth = np.einsum("kia,kib->kab", V, V)
        np.testing.assert_allclose(orth, np.broadcast_to(np.eye(3), orth.shape), atol=1e-12)
        res = np.einsum("kij,kja->kia", A, V) - w[:, None, :] * V
        assert np.abs(res).max() <= 1e-12 * scale
