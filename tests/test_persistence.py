"""Durable artifacts: FeatureTable npz round-trip, PropertyGraph pickle."""

import numpy as np

from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.engine import analyze
from tissue_analysis_tpu.features.table import FeatureTable
from tissue_analysis_tpu.graph.from_image import graph_from_table
from tissue_analysis_tpu.graph.property_graph import (
    PropertyGraph,
    TemporalPropertyGraph,
)


def test_feature_table_roundtrip(tmp_path):
    img = voronoi_stack((20, 20, 20), 15, seed=0, voxelsize=(2.0, 0.5, 0.5))
    table = analyze(np.asarray(img), voxelsize=img.voxelsize, background=1)
    p = str(tmp_path / "table.npz")
    table.save(p)
    back = FeatureTable.load(p)
    for f in FeatureTable._ARRAY_FIELDS:
        np.testing.assert_array_equal(getattr(table, f), getattr(back, f), f)
    assert back.shape == table.shape
    assert back.voxelsize == table.voxelsize
    assert back.background_segment == table.background_segment
    # derived features identical after reload
    np.testing.assert_array_equal(table.volume(), back.volume())
    assert table.adjacency() == back.adjacency()


def test_property_graph_roundtrip(tmp_path):
    img = voronoi_stack((20, 20, 20), 15, seed=0)
    g = graph_from_table(analyze(np.asarray(img), background=1))
    p = str(tmp_path / "graph.pkl")
    g.save(p)
    back = PropertyGraph.load(p)
    assert back.nb_vertices() == g.nb_vertices()
    assert back.nb_edges() == g.nb_edges()
    assert back.vertex_property("volume") == g.vertex_property("volume")
    assert back.edge_property("wall_surface") == g.edge_property("wall_surface")
    assert back.graph_property("label2vertex") == g.graph_property("label2vertex")


def test_temporal_graph_roundtrip(tmp_path):
    from tissue_analysis_tpu.series import temporal_graph_from_images

    frames = [voronoi_stack((16, 16, 16), nc, seed=s) for nc, s in [(8, 0), (12, 1)]]
    tpg = temporal_graph_from_images(frames, [{2: [2]}], background=1)
    p = str(tmp_path / "tpg.pkl")
    tpg.save(p)
    back = TemporalPropertyGraph.load(p)
    assert back.graph_property("nb_time_points") == 2
    assert back.nb_vertices() == tpg.nb_vertices()
    assert back.vertex_at_time(1) == tpg.vertex_at_time(1)
