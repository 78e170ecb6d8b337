"""TemporalPropertyGraph + lineage analysis (SURVEY.md §3.6)."""

import numpy as np
import pytest

from tissue_analysis_tpu import graph_from_image
from tissue_analysis_tpu.core.spatial_image import SpatialImage
from tissue_analysis_tpu.graph import (
    TemporalPropertyGraph,
    exist_relative_at_rank,
    relative_temporal_change,
    temporal_change,
)
from tissue_analysis_tpu.graph.temporal import lineage_volumes, temporal_rate


def _timepoint_images():
    """t0: cells 2,3 · t1: 2 grows, 3 divides into 3,4."""
    t0 = np.ones((8, 8, 8), dtype=np.uint8)
    t0[1:4, 1:7, 1:7] = 2
    t0[4:7, 1:7, 1:7] = 3
    t1 = np.ones((8, 8, 8), dtype=np.uint8)
    t1[1:5, 1:7, 1:7] = 2
    t1[5:7, 1:4, 1:7] = 3
    t1[5:7, 4:7, 1:7] = 4
    return SpatialImage(t0), SpatialImage(t1)


@pytest.fixture(scope="module")
def tpg():
    t0, t1 = _timepoint_images()
    g0 = graph_from_image(t0, background=1)
    g1 = graph_from_image(t1, background=1)
    g = TemporalPropertyGraph()
    g.extend([g0, g1], [{2: [2], 3: [3, 4]}])
    return g


def test_structure(tpg):
    assert tpg.graph_property("nb_time_points") == 2
    assert len(tpg.vertex_at_time(0)) == 2
    assert len(tpg.vertex_at_time(1)) == 3
    et = tpg.edge_property("edge_type")
    n_temporal = sum(1 for v in et.values() if v == TemporalPropertyGraph.TEMPORAL)
    assert n_temporal == 3  # 2→2, 3→3, 3→4


def test_lineage_navigation(tpg):
    old = tpg.vertex_property("old_label")
    idx = tpg.vertex_property("index")
    v3 = next(v for v, l in old.items() if l == 3 and idx[v] == 0)
    kids = tpg.children(v3)
    assert sorted(old[k] for k in kids) == [3, 4]
    assert tpg.parent(kids[0]) == v3
    assert tpg.descendants_at_rank(v3, 1) == sorted(kids)
    assert exist_relative_at_rank(tpg, v3, 1)
    assert not exist_relative_at_rank(tpg, kids[0], 1)
    assert exist_relative_at_rank(tpg, kids[0], -1)


def test_temporal_change_volume(tpg):
    old = tpg.vertex_property("old_label")
    idx = tpg.vertex_property("index")
    vol = tpg.vertex_property("volume")
    changes = temporal_change(tpg, "volume", rank=1)
    v2 = next(v for v, l in old.items() if l == 2 and idx[v] == 0)
    v3 = next(v for v, l in old.items() if l == 3 and idx[v] == 0)
    assert set(changes) == {v2, v3}
    kids3 = tpg.children(v3)
    assert changes[v3] == pytest.approx(sum(vol[k] for k in kids3) - vol[v3])
    rel = relative_temporal_change(tpg, "volume", rank=1)
    assert rel[v2] == pytest.approx(changes[v2] / vol[v2])
    rate = temporal_rate(tpg, "volume", rank=1, delta_t=2.0)
    total3 = sum(vol[k] for k in kids3)
    assert rate[v3] == pytest.approx((total3 / vol[v3]) ** 0.5 - 1.0)
    traj = lineage_volumes(tpg, v3)
    assert traj == [vol[v3], total3]
