"""Observability: per-stage timing collection (SURVEY.md §5)."""

import numpy as np

from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.engine import analyze
from tissue_analysis_tpu.graph.from_image import graph_from_table
from tissue_analysis_tpu.utils import timing


def test_collect_reports_stages():
    img = voronoi_stack((16, 16, 16), 10, seed=0)
    with timing.collect() as t:
        table = analyze(np.asarray(img), background=1)
        graph_from_table(table)
    names = [s.name for s in t.stages]
    assert "ingest: dense relabel" in names
    assert "device sweep (blocked)" in names
    assert "graph: property-graph build" in names
    rep = t.report()
    assert "Mvox/s" in rep and "total" in rep
    d = t.as_dict()
    assert d["device sweep (blocked)"]["seconds"] > 0


def test_inactive_collection_is_noop():
    img = voronoi_stack((12, 12, 12), 5, seed=1)
    # must not raise or record anything without an active collector
    analyze(np.asarray(img), background=1)


def test_nested_collectors_restore():
    with timing.collect() as outer:
        with timing.collect() as inner:
            with timing.stage("x"):
                pass
        with timing.stage("y"):
            pass
    assert [s.name for s in inner.stages] == ["x"]
    assert [s.name for s in outer.stages] == ["y"]
