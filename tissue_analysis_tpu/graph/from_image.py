"""graph_from_image — labeled image → cell PropertyGraph.

Parity target: ``graphs_from_image.py :: graph_from_image`` (SURVEY.md §2.1
row 7, §3.5): vertices = cells, edges = shared walls; vertex properties
``volume, barycenter, boundingbox, border, L1, inertia_axis,
epidermis_surface`` (the last for L1 cells only); edge property
``wall_surface``; ``label2vertex``/``vertex2label`` maps stored as graph
properties. Here the whole thing is served from ONE fused device pass
instead of one full-image pass per property.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

import numpy as np

from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.engine import analyze_stack
from tissue_analysis_tpu.features.table import FeatureTable
from tissue_analysis_tpu.graph.property_graph import PropertyGraph

__all__ = [
    "graph_from_image",
    "graph_from_table",
    "generate_graph_topology",
    "DEFAULT_PROPERTIES",
]

DEFAULT_PROPERTIES = (
    "volume",
    "barycenter",
    "boundingbox",
    "border",
    "L1",
    "inertia_axis",
    "epidermis_surface",
    "wall_surface",
)


def _bulk_topology(labels: Sequence[int], edge_pairs) -> PropertyGraph:
    """Topology from explicit (smaller label, larger label) edge pairs.

    Same graph as :func:`generate_graph_topology` (vertices numbered in
    label order, edges in ascending (l, nb) order) built without the
    per-label adjacency dict. ``edge_pairs`` may be a [E, 2] ndarray
    ALREADY sorted ascending and unique (the vectorized COO path), or any
    iterable of pairs (deduped and sorted here). Edge ids are sequential in
    that order — callers may rely on eid i == row i.
    """
    graph = PropertyGraph()
    label2vertex = {int(l): i for i, l in enumerate(labels)}
    if isinstance(edge_pairs, np.ndarray):
        pairs = edge_pairs.tolist()
    else:
        pairs = sorted(set(edge_pairs))
    graph._bulk_fill(
        len(labels), [(label2vertex[a], label2vertex[b]) for a, b in pairs]
    )
    graph.add_graph_property("label2vertex", label2vertex)
    graph.add_graph_property(
        "vertex2label", {v: k for k, v in label2vertex.items()}
    )
    return graph


def generate_graph_topology(labels: Sequence[int], neighborhood) -> PropertyGraph:
    """Topology only: one vertex per label, one edge per unordered neighbor
    pair (``:: generate_graph_topology`` [M])."""
    graph = PropertyGraph()
    label2vertex = {}
    for l in labels:
        label2vertex[l] = graph.add_vertex()
    labelset = set(labels)
    for l in labels:
        for nb in neighborhood.get(l, []):
            if nb in labelset and l < nb:
                graph.add_edge(label2vertex[l], label2vertex[nb])
    graph.add_graph_property("label2vertex", label2vertex)
    graph.add_graph_property(
        "vertex2label", {v: k for k, v in label2vertex.items()}
    )
    return graph


def graph_from_image(
    image,
    labels: Optional[Sequence[int]] = None,
    background: int = 1,
    default_properties: Iterable[str] = DEFAULT_PROPERTIES,
    default_real_property: bool = True,
    bbox_as_real: bool = False,
    min_contact_area: Optional[float] = None,
    ignoredlabels: Iterable[int] = (),
    remove_stack_margins_cells: bool = False,
) -> PropertyGraph:
    stack = LabeledStack.from_array(
        image,
        voxelsize=getattr(image, "voxelsize", None),
        background=background,
    )
    table = analyze_stack(stack)
    return graph_from_table(
        table,
        labels=labels,
        background=background,
        default_properties=default_properties,
        default_real_property=default_real_property,
        bbox_as_real=bbox_as_real,
        min_contact_area=min_contact_area,
        ignoredlabels=ignoredlabels,
        remove_stack_margins_cells=remove_stack_margins_cells,
    )


def graph_from_table(
    table: FeatureTable,
    labels: Optional[Sequence[int]] = None,
    background: Optional[int] = None,
    default_properties: Iterable[str] = DEFAULT_PROPERTIES,
    default_real_property: bool = True,
    bbox_as_real: bool = False,
    min_contact_area: Optional[float] = None,
    ignoredlabels: Iterable[int] = (),
    remove_stack_margins_cells: bool = False,
) -> PropertyGraph:
    """Build the cell PropertyGraph from an already-computed FeatureTable."""
    from tissue_analysis_tpu.utils import timing

    with timing.stage("graph: property-graph build"):
        return _graph_from_table_impl(
            table, labels, background, default_properties, default_real_property,
            bbox_as_real, min_contact_area, ignoredlabels,
            remove_stack_margins_cells,
        )


def _graph_from_table_impl(
    table, labels, background, default_properties, default_real_property,
    bbox_as_real, min_contact_area, ignoredlabels, remove_stack_margins_cells,
) -> PropertyGraph:
    if background is None:
        background = table.background_id
    ignored = set(int(i) for i in ignoredlabels) | {background}

    if remove_stack_margins_cells:
        ignored |= set(table.margin_labels()) - {background}

    if labels is None:
        labels = [int(l) for l in sorted(table.ids) if int(l) not in ignored]
    else:
        labels = [int(l) for l in labels if int(l) not in ignored]

    # topology straight from the COO pair arrays (vectorized — the
    # per-label adjacency dict would cost a host sort + python loops)
    la = table.ids[table.pair_lo]
    lb = table.ids[table.pair_hi]
    keep = np.ones(la.shape[0], dtype=bool)
    if min_contact_area is not None:
        keep &= table.wall_areas() >= min_contact_area
    lab_arr = np.asarray(labels, dtype=np.int64)
    keep &= np.isin(la, lab_arr) & np.isin(lb, lab_arr)
    # unordered pairs, lexicographically sorted + deduped in numpy (the
    # python sorted(set(...)) over ~10⁴ tuples costs real milliseconds);
    # `inv` maps each kept COO entry to its unique-pair row = its edge id
    amin = np.minimum(la[keep], lb[keep]).astype(np.int64)
    amax = np.maximum(la[keep], lb[keep]).astype(np.int64)
    order = np.lexsort((amax, amin))
    ps, pl = amin[order], amax[order]
    if ps.shape[0]:
        new = np.empty(ps.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (ps[1:] != ps[:-1]) | (pl[1:] != pl[:-1])
    else:
        new = np.zeros(0, dtype=bool)
    uniq = np.stack([ps[new], pl[new]], axis=1)
    inv = np.empty(ps.shape[0], dtype=np.int64)
    inv[order] = np.cumsum(new) - 1
    graph = _bulk_topology(labels, uniq)
    label2vertex = graph.graph_property("label2vertex")

    real = default_real_property
    props = set(default_properties)
    id2seg = {int(l): s for s, l in enumerate(table.ids)}
    seg = {l: id2seg[l] for l in labels}
    l1 = set(table.l1_labels())
    margins = set(table.margin_labels())

    if "volume" in props:
        vol = table.volume(real=real)
        graph.add_vertex_property(
            "volume", {label2vertex[l]: float(vol[seg[l]]) for l in labels}
        )
    if "barycenter" in props:
        bary = table.barycenter(real=real)
        graph.add_vertex_property(
            "barycenter", {label2vertex[l]: bary[seg[l]] for l in labels}
        )
    if "boundingbox" in props:
        slices = table.bounding_slices()
        if bbox_as_real:
            v = np.asarray(table.voxelsize, np.float64)
            bb = {
                label2vertex[l]: tuple(
                    (s.start * v[d], s.stop * v[d])
                    for d, s in enumerate(slices[seg[l]])
                )
                for l in labels
            }
        else:
            bb = {label2vertex[l]: slices[seg[l]] for l in labels}
        graph.add_vertex_property("boundingbox", bb)
    if "border" in props:
        graph.add_vertex_property(
            "border", {label2vertex[l]: l in margins for l in labels}
        )
    if "L1" in props:
        graph.add_vertex_property(
            "L1", {label2vertex[l]: l in l1 for l in labels}
        )
    if "inertia_axis" in props:
        evals, evecs = table.inertia_axes(real=real)
        graph.add_vertex_property(
            "inertia_axis",
            {label2vertex[l]: (evecs[seg[l]], evals[seg[l]]) for l in labels},
        )
    if "epidermis_surface" in props:
        epi = table.epidermis_wall_area()
        graph.add_vertex_property(
            "epidermis_surface",
            {label2vertex[l]: float(epi[seg[l]]) for l in labels if l in l1},
        )
    if "wall_surface" in props:
        vals = (
            table.wall_areas()
            if real
            else table.wall_voxel_face_totals()
        )
        # accumulate per unique unordered pair (eid i == uniq row i by
        # _bulk_topology's contract), vectorized
        sums = np.zeros(uniq.shape[0], dtype=vals.dtype)
        np.add.at(sums, inv, vals[keep])
        wall_prop = graph.add_edge_property("wall_surface")
        if real:
            wall_prop.update(enumerate(map(float, sums)))
        else:
            wall_prop.update(enumerate(map(int, sums)))

    graph.add_graph_property("voxelsize", tuple(table.voxelsize))
    graph.add_graph_property("background", background)
    graph.add_graph_property("shape", tuple(table.shape))
    return graph
