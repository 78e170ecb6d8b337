"""Surfacic (3DS) semantics on a curved-monolayer fixture, oracle-pinned.

Parity target: ``spatial_image_analysis.py :: SpatialImageAnalysis3DS``
(SURVEY.md §2.1 row 5, [M] — reconstructed inside-filler model, see the
class docstring). VERDICT r1 missing #3 requires at least one behavior that
DIFFERS from plain 3D on this fixture, pinned against the scipy oracle.
"""

import numpy as np
import pytest

from tissue_analysis_tpu.analysis.dimensional import (
    SpatialImageAnalysis3D,
    SpatialImageAnalysis3DS,
)
from tissue_analysis_tpu.core.synthetic import monolayer_shell
from tissue_analysis_tpu.oracle import ScipyOracle

BG, INSIDE = 1, 2


@pytest.fixture(scope="module")
def shell():
    return monolayer_shell((36, 36, 36), ncells=30, seed=3)


@pytest.fixture(scope="module")
def a3ds(shell):
    return SpatialImageAnalysis3DS(shell, background=BG, inside_label=INSIDE)


@pytest.fixture(scope="module")
def a3d(shell):
    return SpatialImageAnalysis3D(shell, background=BG)


@pytest.fixture(scope="module")
def oracle(shell):
    return ScipyOracle(np.asarray(shell), background=BG)


def test_labels_exclude_inside(a3ds, a3d):
    assert INSIDE in a3d.labels()
    assert INSIDE not in a3ds.labels()
    assert a3ds.nb_labels() == a3d.nb_labels() - 1


def test_neighbors_are_lateral(a3ds, a3d, oracle):
    """3DS adjacency drops the inside filler — lists differ from 3D and
    match the oracle with the filler removed."""
    ref = oracle.neighbors()
    got3d = a3d.neighbors()
    got = a3ds.neighbors()
    assert INSIDE not in got
    differs = False
    for l, nbs in got.items():
        assert INSIDE not in nbs
        exp = [x for x in ref[l] if x != INSIDE]
        assert nbs == exp, l
        if got3d[l] != nbs:
            differs = True
    assert differs  # the monolayer cells DO touch the filler in 3D


def test_l1_is_every_cell(a3ds):
    """A true monolayer is entirely epidermal."""
    cells = [l for l in a3ds.labels() if l != BG]
    assert a3ds.L1() == cells


def test_basal_surface_matches_oracle(a3ds, oracle):
    walls = oracle.wall_pairs(real=True)
    got = a3ds.basal_surface()
    assert set(got) == set(a3ds.labels())
    nonzero = 0
    for l, v in got.items():
        exp = walls.get((min(l, INSIDE), max(l, INSIDE)), 0.0)
        assert v == exp, l
        nonzero += v > 0
    assert nonzero > 0


def test_area_is_apical_not_volume(a3ds, oracle):
    epi = oracle.epidermis_surface(real=True)
    vol = oracle.volume(real=True)
    got = a3ds.area()
    for l, v in got.items():
        assert v == epi.get(l, 0.0), l
    # the distinct-from-3D check: surfacic area is NOT the voxel volume
    assert any(got[l] != vol[l] for l in got)


def test_without_inside_label_degrades_to_3d(shell):
    a = SpatialImageAnalysis3DS(shell, background=BG)
    b = SpatialImageAnalysis3D(shell, background=BG)
    assert a.labels() == b.labels()
    assert a.neighbors() == b.neighbors()
