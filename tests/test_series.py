"""Time-series batch pipeline: shared-compile analysis, temporal graphs."""

import numpy as np

from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.engine import analyze_stack, analyze_stack_blocked
from tissue_analysis_tpu.series import (
    analyze_series,
    graph_series,
    temporal_graph_from_images,
)


def _frames():
    return [
        voronoi_stack((24, 24, 24), nc, seed=s, voxelsize=(1.5, 0.5, 0.5))
        for nc, s in [(12, 0), (20, 1), (30, 2)]
    ]


def test_analyze_series_matches_per_frame():
    frames = _frames()
    tables = analyze_series(frames, background=1)
    for img, t in zip(frames, tables):
        stack = LabeledStack.from_array(
            np.asarray(img), voxelsize=img.voxelsize, background=1
        )
        ref = analyze_stack(stack)
        np.testing.assert_array_equal(t.count, ref.count)
        np.testing.assert_array_equal(t.s1, ref.s1)
        np.testing.assert_array_equal(t.pair_lo, ref.pair_lo)
        np.testing.assert_array_equal(t.wall_face_counts, ref.wall_face_counts)
        np.testing.assert_array_equal(t.margin, ref.margin)


def test_bucketed_equals_exact_n():
    img = voronoi_stack((24, 24, 24), 20, seed=1)
    stack = LabeledStack.from_array(np.asarray(img), background=1)
    a = analyze_stack_blocked(stack)
    b = analyze_stack_blocked(stack, n_bucket=256)
    for f in ("count", "s1", "s2", "cmin", "cmax", "pair_lo", "pair_hi",
              "wall_face_counts", "margin"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_graph_series_and_temporal_pipeline():
    frames = _frames()
    graphs = graph_series(frames, background=1)
    assert len(graphs) == 3
    for g in graphs:
        assert g.nb_vertices() > 0
        assert "volume" in g.vertex_property_names()

    # fabricate a lineage: every label maps to itself where present
    def labels_of(g):
        return set(g.graph_property("label2vertex"))

    lineages = []
    for a, b in zip(graphs, graphs[1:]):
        common = labels_of(a) & labels_of(b)
        lineages.append({l: [l] for l in common})

    tpg = temporal_graph_from_images(frames, lineages, background=1)
    assert tpg.graph_property("nb_time_points") == 3
    n_struct = sum(
        1 for e in tpg.edges() if tpg.edge_property("edge_type")[e] == "s"
    )
    n_temp = sum(
        1 for e in tpg.edges() if tpg.edge_property("edge_type")[e] == "t"
    )
    assert n_struct == sum(g.nb_edges() for g in graphs)
    assert n_temp == sum(len(m) for m in lineages)

    # temporal_change works end to end on the lineage-linked volume
    from tissue_analysis_tpu.graph.temporal import temporal_change

    vids = tpg.vertex_at_time(0)
    changes = temporal_change(tpg, "volume", vids, rank=1)
    assert changes  # at least some lineage-linked cells


def test_devices_roundrobin():
    import jax

    frames = _frames()
    tables = analyze_series(frames, background=1, devices=jax.devices()[:2])
    assert len(tables) == 3
