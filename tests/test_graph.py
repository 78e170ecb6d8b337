"""graph_from_image + PropertyGraph export parity (SURVEY.md §3.5)."""

import numpy as np
import pytest

from tissue_analysis_tpu import graph_from_image
from tissue_analysis_tpu.graph.property_graph import PropertyGraph
from tissue_analysis_tpu.oracle import ScipyOracle


@pytest.fixture(scope="module")
def g(small3d):
    return graph_from_image(small3d, background=1)


@pytest.fixture(scope="module")
def oracle(small3d):
    return ScipyOracle(small3d, background=1)


def test_vertices_are_cells(g, oracle):
    cells = [int(l) for l in oracle.labels if l != 1]
    assert g.nb_vertices() == len(cells)
    l2v = g.graph_property("label2vertex")
    assert sorted(l2v) == cells


def test_edges_are_shared_walls(g, oracle):
    nbh = oracle.neighbors()
    expected = {
        (a, b)
        for a, nbs in nbh.items()
        if a != 1
        for b in nbs
        if b != 1 and a < b
    }
    l2v = g.graph_property("label2vertex")
    v2l = g.graph_property("vertex2label")
    got = set()
    for eid in g.edges():
        va, vb = g.edge_vertices(eid)
        la, lb = v2l[va], v2l[vb]
        got.add((min(la, lb), max(la, lb)))
    assert got == expected
    assert g.nb_edges() == len(expected)


def test_vertex_properties(g, oracle):
    l2v = g.graph_property("label2vertex")
    vol = g.vertex_property("volume")
    bary = g.vertex_property("barycenter")
    ref_vol = oracle.volume(real=True)
    ref_bary = oracle.barycenter(real=True)
    l1 = set(oracle.l1())
    margins = set(oracle.cells_in_image_margins())
    for l, v in l2v.items():
        assert vol[v] == ref_vol[l]
        assert np.array_equal(bary[v], ref_bary[l])
        assert g.vertex_property("L1")[v] == (l in l1)
        assert g.vertex_property("border")[v] == (l in margins)
    # epidermis_surface only for L1 cells (§3.5)
    epi = g.vertex_property("epidermis_surface")
    assert set(epi) == {l2v[l] for l in l1 if l in l2v}
    ref_epi = oracle.epidermis_surface(real=True)
    for l in l1:
        assert epi[l2v[l]] == ref_epi[l]


def test_edge_wall_surface(g, oracle):
    walls = oracle.wall_pairs(real=True)
    v2l = g.graph_property("vertex2label")
    ws = g.edge_property("wall_surface")
    for eid in g.edges():
        va, vb = g.edge_vertices(eid)
        la, lb = v2l[va], v2l[vb]
        assert ws[eid] == walls[(min(la, lb), max(la, lb))]


def test_min_contact_area_prunes_edges(small3d, g):
    areas = sorted(g.edge_property("wall_surface").values())
    thr = areas[len(areas) // 2]
    g2 = graph_from_image(small3d, background=1, min_contact_area=thr)
    assert g2.nb_edges() == sum(1 for a in areas if a >= thr)


def test_remove_stack_margins(small3d, oracle):
    g2 = graph_from_image(small3d, background=1, remove_stack_margins_cells=True)
    margins = set(oracle.cells_in_image_margins()) - {1}
    l2v = g2.graph_property("label2vertex")
    assert not (set(l2v) & margins)


def test_bbox_as_real(small3d):
    g2 = graph_from_image(
        small3d, background=1, default_properties=("boundingbox",), bbox_as_real=True
    )
    bb = g2.vertex_property("boundingbox")
    v = np.asarray(small3d.voxelsize)
    for vid, box in bb.items():
        assert len(box) == 3
        for d, (lo, hi) in enumerate(box):
            assert lo < hi
            assert lo % v[d] == pytest.approx(0.0)


def test_networkx_export(g):
    nx_g = g.to_networkx()
    assert nx_g.number_of_nodes() == g.nb_vertices()
    assert nx_g.number_of_edges() == g.nb_edges()
    some_node = next(iter(nx_g.nodes))
    assert "volume" in nx_g.nodes[some_node]


def test_property_graph_basics():
    pg = PropertyGraph()
    a, b, c = pg.add_vertex(), pg.add_vertex(), pg.add_vertex(10)
    e1 = pg.add_edge(a, b)
    pg.add_edge(b, c)
    assert pg.nb_vertices() == 3 and pg.nb_edges() == 2
    assert pg.neighbors(b) == sorted([a, c])
    assert pg.edge_vertices(e1) == (a, b)
    assert pg.edge_id(a, b) == e1 and pg.edge_id(a, c) is None
    pg.add_vertex_property("volume", {a: 1.0})
    assert pg.vertex_property("volume")[a] == 1.0
    d = pg.to_dict()
    assert set(d) == {
        "vertices",
        "edges",
        "vertex_properties",
        "edge_properties",
        "graph_properties",
    }
