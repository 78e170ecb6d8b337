"""18/26-connectivity neighbors vs the scipy dilation oracle."""

import numpy as np
import pytest

from tissue_analysis_tpu.analysis import SpatialImageAnalysis
from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.oracle.scipy_oracle import ScipyOracle
from tissue_analysis_tpu.ops.stencil import connectivity_offsets


def test_offsets_counts():
    assert len(connectivity_offsets(3, 1)) == 3
    assert len(connectivity_offsets(3, 2)) == 9
    assert len(connectivity_offsets(3, 3)) == 13
    assert len(connectivity_offsets(2, 1)) == 2
    assert len(connectivity_offsets(2, 2)) == 4


def _corner_touch_image():
    """Two cubes meeting only at a corner + background elsewhere."""
    img = np.ones((8, 8, 8), dtype=np.uint8)
    img[1:4, 1:4, 1:4] = 5
    img[4:7, 4:7, 4:7] = 9
    return img


@pytest.mark.parametrize("conn", [1, 2, 3])
def test_neighbors_connectivity_matches_oracle(conn):
    img = voronoi_stack((24, 24, 24), 20, seed=3, voxelsize=(2.0, 0.5, 0.5))
    a = SpatialImageAnalysis(np.asarray(img), background=1)
    oracle = ScipyOracle(np.asarray(img), voxelsize=img.voxelsize, background=1)
    got = a.neighbors(connectivity=conn)
    exp = oracle.neighbors(connectivity=conn)
    assert got == exp


def test_corner_touch_needs_26():
    img = _corner_touch_image()
    a = SpatialImageAnalysis(img, background=1)
    assert 9 not in a.neighbors(5, connectivity=1)
    assert 9 not in a.neighbors(5, connectivity=2)
    assert 9 in a.neighbors(5, connectivity=3)
    # oracle agrees
    oracle = ScipyOracle(img, background=1)
    assert 9 in oracle.neighbors([5], connectivity=3)[5]
    assert 9 not in oracle.neighbors([5], connectivity=1)[5]


def test_min_contact_area_is_face_based():
    img = _corner_touch_image()
    a = SpatialImageAnalysis(img, background=1)
    # corner-only contact has zero face area -> filtered at any threshold
    nb = a.neighbors(5, connectivity=3, min_contact_area=0.5)
    assert 9 not in nb
    assert 1 in nb  # the background wall is a real face contact
