"""Reference-facade semantics: return modes, ignoredlabels, margins, L1,
wall surfaces, inertia, remove_margins_cells (SURVEY.md §2.1 rows 1–6)."""

import numpy as np
import pytest

from tissue_analysis_tpu import (
    DICT,
    LIST,
    NPLIST,
    SpatialImageAnalysis,
    SpatialImageAnalysis2D,
    SpatialImageAnalysis3D,
    SpatialImageAnalysis3DS,
)
from tissue_analysis_tpu.oracle import ScipyOracle


@pytest.fixture(scope="module")
def a3(small3d):
    return SpatialImageAnalysis(small3d, background=1)


@pytest.fixture(scope="module")
def oracle3(small3d):
    return ScipyOracle(small3d, background=1)


def test_factory_dispatch(small3d, small2d):
    assert isinstance(SpatialImageAnalysis(small3d), SpatialImageAnalysis3D)
    assert isinstance(SpatialImageAnalysis(small2d), SpatialImageAnalysis2D)
    thin = np.ones((2, 16, 16), dtype=np.uint8)
    assert isinstance(SpatialImageAnalysis(thin), SpatialImageAnalysis3DS)
    assert isinstance(
        SpatialImageAnalysis(np.asarray(small3d), variant="3DS"),
        SpatialImageAnalysis3DS,
    )


def test_labels_and_ignored(a3, oracle3, small3d):
    assert a3.labels() == [int(l) for l in oracle3.labels]
    b = SpatialImageAnalysis(small3d, ignoredlabels=[1], background=1)
    assert b.labels() == [int(l) for l in oracle3.labels if l != 1]
    assert b.nb_labels() == len(oracle3.labels) - 1


def test_return_modes(small3d, oracle3):
    ref = oracle3.volume(real=True)
    a = SpatialImageAnalysis(small3d, return_type=DICT, background=1)
    d = a.volume()
    assert isinstance(d, dict) and d == {int(k): v for k, v in ref.items()}
    a.return_type = LIST
    assert a.volume() == [ref[l] for l in a.labels()]
    a.return_type = NPLIST
    np.testing.assert_array_equal(a.volume(), np.array([ref[l] for l in a.labels()]))


def test_scalar_request(a3, oracle3):
    l = a3.labels()[2]
    assert a3.volume(l) == oracle3.volume()[l]
    assert np.array_equal(a3.center_of_mass(l), oracle3.barycenter()[l])


def test_boundingbox_semantics(a3, oracle3):
    ref = oracle3.boundingbox()
    got = a3.boundingbox()
    for l, sl in ref.items():
        if sl is not None:
            assert got[l] == sl
    # absent label → None, find_objects-style
    assert a3.boundingbox(999999) is None
    # real bounding boxes scale by voxelsize
    l = a3.labels()[3]
    vb = a3.boundingbox(l)
    rb = a3.boundingbox(l, real=True)
    v = a3.voxelsize
    assert rb == tuple((s.start * v[d], s.stop * v[d]) for d, s in enumerate(vb))


def test_neighbors_matches_oracle(a3, oracle3):
    assert a3.neighbors() == oracle3.neighbors()


def test_neighbors_excludes_ignored(small3d):
    a = SpatialImageAnalysis(small3d, background=1)
    some_cell = a.L1()[0]
    victims = [l for l in a.neighbors(some_cell) if l != 1][:1]
    b = SpatialImageAnalysis(small3d, ignoredlabels=victims, background=1)
    assert victims[0] not in b.neighbors(some_cell)
    assert 1 in b.neighbors(some_cell)  # background stays


def test_l1_and_borders(a3, oracle3):
    assert a3.L1() == oracle3.l1()
    assert a3.cells_in_image_margins() == oracle3.cells_in_image_margins()
    assert a3.border_cells() == [
        l for l in oracle3.cells_in_image_margins() if l != 1
    ]


def test_wall_surfaces(a3, oracle3):
    ref = oracle3.wall_pairs(real=True)
    got = a3.wall_surfaces()
    assert got == dict(sorted(ref.items()))
    l1, l2 = next(iter(ref))
    assert a3.cell_wall_surface(l1, l2) == ref[(l1, l2)]
    assert a3.cell_wall_surface(l1, 424242) == 0.0


def test_epidermis_surface(a3, oracle3):
    ref = oracle3.epidermis_surface(real=True)
    got = a3.epidermis_surface()
    assert got == ref


def test_inertia_axis(a3, oracle3):
    evals_ref, evecs_ref = oracle3.inertia_axes(real=True)
    got = a3.inertia_axis()
    for l in a3.labels():
        vecs, vals = got[l]
        np.testing.assert_array_equal(vals, evals_ref[l])
        np.testing.assert_array_equal(vecs, evecs_ref[l])
        # eigenvalues descending
        assert np.all(np.diff(vals) <= 1e-12)


def test_wall_voxels_between_two_cells(a3, small3d):
    pairs = a3.table().pair_area_map()
    (l1, l2) = next(p for p in pairs if p[0] != 1)
    coords = a3.wall_voxels_between_two_cells(l1, l2)
    assert coords.shape[0] == 3 and coords.shape[1] > 0
    img = np.asarray(small3d)
    vals = img[tuple(coords)]
    assert set(np.unique(vals)) <= {l1, l2}


def test_remove_margins_cells(small3d):
    a = SpatialImageAnalysis(small3d, background=1)
    doomed = a.border_cells()
    removed = a.remove_margins_cells()
    assert removed == doomed
    for l in doomed:
        assert l not in a.labels()
    # volumes still consistent after recompute
    assert sum(a.volume(real=False).values()) == np.asarray(small3d).size


def test_neighbor_kernels_and_face_surface(a3):
    kernels = a3.neighbor_kernels()
    assert len(kernels) == 6
    assert all(k.sum() == 1 for k in kernels)
    v = np.asarray(a3.voxelsize, np.float64)
    np.testing.assert_allclose(a3.get_voxel_face_surface(), np.prod(v) / v)


def test_2d_analysis(small2d):
    a = SpatialImageAnalysis(small2d, background=1)
    o = ScipyOracle(small2d, background=1)
    assert a.area() == o.volume()
    assert a.neighbors() == o.neighbors()
    got = a.inertia_axis()
    evals_ref, evecs_ref = o.inertia_axes(real=True)
    for l in a.labels():
        vecs, vals = got[l]
        assert vals.shape == (2,) and vecs.shape == (2, 2)
        np.testing.assert_array_equal(vals, evals_ref[l])
    per = a.perimeter()
    walls = o.wall_pairs(real=True)
    for l in a.labels():
        expect = sum(v for (x, y), v in walls.items() if l in (x, y))
        assert per[l] == pytest.approx(expect)


def test_analysis_config():
    from tissue_analysis_tpu.analysis import AnalysisConfig, LIST, SpatialImageAnalysis
    from tissue_analysis_tpu.core.synthetic import voronoi_stack
    import numpy as np

    img = voronoi_stack((16, 16, 16), 10, seed=0)
    cfg = AnalysisConfig(background=1, ignoredlabels=(3,), return_type=LIST)
    a = SpatialImageAnalysis(np.asarray(img), config=cfg)
    assert a.config is cfg or a.config == cfg
    assert 3 not in a.labels()
    assert isinstance(a.volume(), list)
    # explicit kwarg overrides the config field
    b = SpatialImageAnalysis(np.asarray(img), config=cfg, return_type=0)
    assert isinstance(b.volume(), dict)


def test_explicit_background_1_overrides_config(small3d):
    """Regression (ADVICE r1): an explicit background=1 kwarg must override
    an AnalysisConfig whose background differs — the old `background != 1`
    check conflated 'not passed' with 'explicitly 1'."""
    from tissue_analysis_tpu.analysis import AnalysisConfig, SpatialImageAnalysis

    cfg = AnalysisConfig(background=7)
    a = SpatialImageAnalysis(small3d, background=1, config=cfg)
    assert a.background() == 1
    # and not passing background keeps the config's value
    b = SpatialImageAnalysis(small3d, config=cfg)
    assert b.background() == 7
