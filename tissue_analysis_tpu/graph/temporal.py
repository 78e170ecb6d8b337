"""Temporal (lineage) analysis over TemporalPropertyGraph.

Parity targets: ``temporal_graph_analysis.py`` (SURVEY.md §2.1 row 8, §3.6):
``temporal_change(g, prop, vids, rank)``, ``relative_temporal_change``,
``exist_relative_at_rank`` and growth-rate helpers. All host-side and small
— the per-timepoint feature extraction upstream is the device-heavy part.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from tissue_analysis_tpu.graph.property_graph import TemporalPropertyGraph

__all__ = [
    "exist_relative_at_rank",
    "temporal_change",
    "relative_temporal_change",
    "temporal_rate",
    "lineage_volumes",
]


def exist_relative_at_rank(g: TemporalPropertyGraph, vid: int, rank: int) -> bool:
    """True if the vertex has descendants (rank>0) / an ancestor (rank<0)."""
    if rank == 0:
        return True
    if rank > 0:
        return len(g.descendants_at_rank(vid, rank)) > 0
    return g.ancestor_at_rank(vid, -rank) is not None


def _descendant_property_sum(g, name: str, vid: int, rank: int) -> Optional[float]:
    """Σ property over rank-descendants (division splits a mother's quantity)."""
    desc = g.descendants_at_rank(vid, rank)
    if not desc:
        return None
    prop = g.vertex_property(name)
    vals = [prop[d] for d in desc if d in prop]
    if len(vals) != len(desc):
        return None
    return float(np.sum(vals))


def temporal_change(
    g: TemporalPropertyGraph,
    name: str,
    vids: Optional[Sequence[int]] = None,
    rank: int = 1,
) -> Dict[int, float]:
    """Absolute change: Σ property(descendants at t+rank) − property(vid)
    (``:: temporal_change``)."""
    prop = g.vertex_property(name)
    if vids is None:
        vids = [v for v in g.vertices() if exist_relative_at_rank(g, v, rank)]
    out: Dict[int, float] = {}
    for v in vids:
        if v not in prop:
            continue
        after = _descendant_property_sum(g, name, v, rank)
        if after is None:
            continue
        out[v] = after - float(prop[v])
    return out


def relative_temporal_change(
    g: TemporalPropertyGraph,
    name: str,
    vids: Optional[Sequence[int]] = None,
    rank: int = 1,
) -> Dict[int, float]:
    """Change divided by the initial value (``:: relative_temporal_change``)."""
    abs_change = temporal_change(g, name, vids, rank)
    prop = g.vertex_property(name)
    return {
        v: c / float(prop[v])
        for v, c in abs_change.items()
        if float(prop[v]) != 0.0
    }


def temporal_rate(
    g: TemporalPropertyGraph,
    name: str,
    vids: Optional[Sequence[int]] = None,
    rank: int = 1,
    delta_t: float = 1.0,
) -> Dict[int, float]:
    """Per-unit-time relative growth: (Σafter/before)^(1/Δt) − 1."""
    prop = g.vertex_property(name)
    if vids is None:
        vids = [v for v in g.vertices() if exist_relative_at_rank(g, v, rank)]
    out: Dict[int, float] = {}
    for v in vids:
        if v not in prop or float(prop[v]) == 0.0:
            continue
        after = _descendant_property_sum(g, name, v, rank)
        if after is None:
            continue
        out[v] = (after / float(prop[v])) ** (1.0 / delta_t) - 1.0
    return out


def lineage_volumes(g: TemporalPropertyGraph, vid: int) -> List[float]:
    """Volume trajectory of a cell lineage (sums over daughters after division)."""
    prop = g.vertex_property("volume")
    out = [float(prop[vid])]
    cur = [vid]
    while True:
        nxt: List[int] = []
        for v in cur:
            nxt.extend(g.children(v))
        if not nxt:
            break
        out.append(float(np.sum([prop[v] for v in nxt])))
        cur = nxt
    return out
