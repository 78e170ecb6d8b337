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


def _three_frame_images():
    """t0: {2,3} · t1: 3 divides into {3,4} · t2: 4 divides into {4,5}."""
    t0 = np.ones((8, 8, 8), dtype=np.uint8)
    t0[1:4, 1:7, 1:7] = 2
    t0[4:7, 1:7, 1:7] = 3
    t1 = np.ones((8, 8, 8), dtype=np.uint8)
    t1[1:4, 1:7, 1:7] = 2
    t1[4:7, 1:4, 1:7] = 3
    t1[4:7, 4:7, 1:7] = 4
    t2 = np.ones((8, 8, 8), dtype=np.uint8)
    t2[1:4, 1:7, 1:7] = 2
    t2[4:7, 1:4, 1:7] = 3
    t2[4:7, 4:7, 1:4] = 4
    t2[4:7, 4:7, 4:7] = 5
    return (SpatialImage(t0), SpatialImage(t1), SpatialImage(t2))


@pytest.fixture(scope="module")
def tpg3():
    frames = _three_frame_images()
    graphs = [graph_from_image(f, background=1) for f in frames]
    g = TemporalPropertyGraph()
    g.extend(graphs, [{2: [2], 3: [3, 4]}, {2: [2], 3: [3], 4: [4, 5]}])
    return g


def _vid(g, label, t):
    old = g.vertex_property("old_label")
    idx = g.vertex_property("index")
    return next(v for v, l in old.items() if l == label and idx[v] == t)


def test_backward_temporal_change(tpg3):
    """rank < 0: the change is anchored at the rank-ancestor and reported
    per living cell (VERDICT r1: backward-rank temporal_change)."""
    from tissue_analysis_tpu.graph.temporal import temporal_change

    g = tpg3
    vol = g.vertex_property("volume")
    back = temporal_change(g, "volume", rank=-1)
    # every t1/t2 vertex with a parent appears; t0 vertices don't
    v3_t0, v3_t1, v4_t1 = _vid(g, 3, 0), _vid(g, 3, 1), _vid(g, 4, 1)
    v4_t2, v5_t2 = _vid(g, 4, 2), _vid(g, 5, 2)
    assert _vid(g, 2, 0) not in back
    exp_3 = (vol[v3_t1] + vol[v4_t1]) - vol[v3_t0]
    assert back[v3_t1] == pytest.approx(exp_3)
    assert back[v4_t1] == pytest.approx(exp_3)  # same mother, same anchor
    exp_45 = (vol[v4_t2] + vol[v5_t2]) - vol[v4_t1]
    assert back[v4_t2] == pytest.approx(exp_45)
    assert back[v5_t2] == pytest.approx(exp_45)

    from tissue_analysis_tpu.graph.temporal import relative_temporal_change

    rel = relative_temporal_change(g, "volume", rank=-1)
    assert rel[v4_t2] == pytest.approx(exp_45 / vol[v4_t1])


def test_rank2_forward_change(tpg3):
    from tissue_analysis_tpu.graph.temporal import temporal_change

    g = tpg3
    vol = g.vertex_property("volume")
    ch = temporal_change(g, "volume", rank=2)
    v3_t0 = _vid(g, 3, 0)
    desc = g.descendants_at_rank(v3_t0, 2)
    assert sorted(g.vertex_property("old_label")[d] for d in desc) == [3, 4, 5]
    assert ch[v3_t0] == pytest.approx(sum(vol[d] for d in desc) - vol[v3_t0])


def test_division_statistics(tpg3):
    from tissue_analysis_tpu.graph.temporal import (
        dividing_cells,
        division_asymmetry,
        division_events,
        division_rate,
        nb_descendants,
    )

    g = tpg3
    vol = g.vertex_property("volume")
    v3_t0, v4_t1 = _vid(g, 3, 0), _vid(g, 4, 1)
    assert dividing_cells(g) == sorted([v3_t0, v4_t1])
    assert dividing_cells(g, 0) == [v3_t0]
    evs = dict(division_events(g))
    assert sorted(evs[v3_t0]) == sorted(g.children(v3_t0))
    nd = nb_descendants(g, rank=1)
    assert nd[v3_t0] == 2 and nd[_vid(g, 2, 0)] == 1
    assert division_rate(g, 0) == pytest.approx(0.5)  # 3 divides, 2 doesn't
    kids = g.children(v4_t1)
    exp = min(vol[k] for k in kids) / max(vol[k] for k in kids)
    assert division_asymmetry(g, v4_t1) == pytest.approx(exp)
    assert division_asymmetry(g, _vid(g, 2, 0)) is None


def test_lineage_aggregates_and_views(tpg3):
    from tissue_analysis_tpu.graph.temporal import (
        lineage_vertices,
        per_lineage_aggregate,
        sibling_cells,
        time_point_property,
    )

    g = tpg3
    vol = g.vertex_property("volume")
    v3_t0 = _vid(g, 3, 0)
    lin = lineage_vertices(g, v3_t0)
    assert len(lin) == 1 + 2 + 3  # 3 | 3,4 | 3,4,5
    agg = per_lineage_aggregate(g, "volume", np.sum)
    assert agg[v3_t0] == pytest.approx(sum(vol[v] for v in lin))
    agg_max = per_lineage_aggregate(g, "volume", np.max, roots=[v3_t0])
    assert agg_max[v3_t0] == pytest.approx(max(vol[v] for v in lin))
    tp1 = time_point_property(g, "volume", 1)
    assert set(tp1) == {2, 3, 4}
    assert tp1[3] == vol[_vid(g, 3, 1)]
    v4_t2 = _vid(g, 4, 2)
    assert sibling_cells(g, v4_t2) == [_vid(g, 5, 2)]
    assert sibling_cells(g, _vid(g, 2, 0)) == []


def test_exist_all_relative(tpg3):
    from tissue_analysis_tpu.graph.temporal import exist_all_relative_at_rank

    g = tpg3
    assert exist_all_relative_at_rank(g, g.vertex_at_time(0), 2)
    assert not exist_all_relative_at_rank(g, g.vertex_at_time(2), 1)
    assert exist_all_relative_at_rank(g, g.vertex_at_time(2), -2)
