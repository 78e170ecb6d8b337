"""One-call fused analysis: labeled image → FeatureTable.

The TPU-native replacement for the reference's whole per-feature pass
structure (SURVEY.md §3.5 "aggregate hot-loop picture"): two device sweeps
(`ops.segred.moment_sweep`, `ops.stencil.pair_sweep`) plus a tiny host
finalize. Everything downstream (the `SpatialImageAnalysis` facade, the
property-graph export) is served from the resulting table without touching
voxels again.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.features.table import FeatureTable
from tissue_analysis_tpu.ops import segred, stencil

__all__ = ["analyze", "analyze_stack"]


def analyze_stack(
    stack: LabeledStack,
    max_pairs: Optional[int] = None,
    chunk: Optional[int] = None,
) -> FeatureTable:
    n = stack.n_labels
    if chunk is None:
        chunk = segred.pick_chunk(stack.shape)
    if max_pairs is None:
        max_pairs = stencil.default_max_pairs(n)

    tables, cmin, cmax = segred.moment_sweep(stack.dense, n, chunk)
    pair_lo, pair_hi, counts, n_pairs, margin = stencil.pair_sweep(
        stack.dense, n, max_pairs, min(chunk, 1 << 21)
    )

    moments = segred.combine_moment_partials(
        np.asarray(tables), np.asarray(cmin), np.asarray(cmax), stack.shape
    )
    n_pairs = int(n_pairs)
    if n_pairs > max_pairs:
        # static buffer overflowed — rerun with the exact size (SURVEY.md §7
        # hard part #1: rerun-larger path)
        return analyze_stack(stack, max_pairs=n_pairs, chunk=chunk)

    return FeatureTable(
        ids=stack.ids.copy(),
        shape=stack.shape,
        voxelsize=stack.voxelsize,
        background_segment=stack.background_segment,
        count=moments["count"],
        s1=moments["s1"],
        s2=moments["s2"],
        cmin=moments["cmin"],
        cmax=moments["cmax"],
        pair_lo=np.asarray(pair_lo)[:n_pairs].astype(np.int32),
        pair_hi=np.asarray(pair_hi)[:n_pairs].astype(np.int32),
        wall_face_counts=np.asarray(counts)[:n_pairs].astype(np.int64),
        margin=np.asarray(margin),
    )


def analyze(
    image,
    voxelsize: Optional[Tuple[float, ...]] = None,
    background: Optional[int] = 1,
    max_pairs: Optional[int] = None,
) -> FeatureTable:
    """Analyze a labeled image (host array / SpatialImage) in one fused pass."""
    stack = LabeledStack.from_array(image, voxelsize=voxelsize, background=background)
    return analyze_stack(stack, max_pairs=max_pairs)
