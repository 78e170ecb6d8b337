"""FeatureTable — the host-side result of one fused analysis pass.

This is the rebuild's native result object (SURVEY.md §7.6 "honest native
API"): every feature of the reference's ``SpatialImageAnalysis`` object is a
cheap lookup/derivation from here; nothing ever re-touches the voxel data.
All label arguments/results use ORIGINAL label ids (the dense segment space
is internal).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tissue_analysis_tpu.features import finalize

__all__ = ["FeatureTable"]


@dataclasses.dataclass
class FeatureTable:
    # identity
    ids: np.ndarray  # int64[N] original label per segment
    shape: Tuple[int, ...]
    voxelsize: Tuple[float, ...]
    background_segment: Optional[int]
    # moments (exact integers)
    count: np.ndarray  # int64[N]
    s1: np.ndarray  # int64[N, D]
    s2: np.ndarray  # int64[N, P]
    cmin: np.ndarray  # int64[N, D]
    cmax: np.ndarray  # int64[N, D]
    # adjacency (COO over segments, lo < hi)
    pair_lo: np.ndarray  # int32[E]
    pair_hi: np.ndarray  # int32[E]
    wall_face_counts: np.ndarray  # int64[E, D] per-axis face counts
    # margins
    margin: np.ndarray  # bool[N]

    # ------------------------------------------------------------------ core
    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def n_labels(self) -> int:
        return int(self.ids.shape[0])

    @property
    def n_pairs(self) -> int:
        return int(self.pair_lo.shape[0])

    @property
    def background_id(self) -> Optional[int]:
        if self.background_segment is None:
            return None
        return int(self.ids[self.background_segment])

    def segment_of(self, label) -> Optional[int]:
        hits = np.nonzero(self.ids == label)[0]
        return int(hits[0]) if hits.size else None

    def _segments_of(self, labels: Sequence[int]) -> List[Optional[int]]:
        return [self.segment_of(l) for l in labels]

    # ------------------------------------------------------------- features
    def volume(self, real: bool = True) -> np.ndarray:
        """Voxel count, or physical volume (f64) if real."""
        if real:
            return finalize.real_volume(self.count, self.voxelsize)
        return self.count.copy()

    def barycenter(self, real: bool = True) -> np.ndarray:
        return finalize.barycenter(
            self.count, self.s1, self.voxelsize if real else None
        )

    def bounding_slices(self) -> List[Optional[Tuple[slice, ...]]]:
        return finalize.bounding_slices(self.count, self.cmin, self.cmax)

    def covariance(self, real: bool = True) -> np.ndarray:
        return finalize.covariance(
            self.count, self.s1, self.s2, self.voxelsize if real else None
        )

    def inertia_axes(self, real: bool = True):
        return finalize.inertia_axes(
            self.count, self.s1, self.s2, self.voxelsize if real else None
        )

    # ------------------------------------------------------------ adjacency
    def face_areas(self) -> np.ndarray:
        """Physical area of one voxel face per axis: ∏voxelsize / voxelsize_d."""
        v = np.asarray(self.voxelsize, dtype=np.float64)
        return np.prod(v) / v

    def wall_areas(self) -> np.ndarray:
        """Real wall contact area per pair: Σ_d faces_d · face_area_d, f64[E]."""
        return self.wall_face_counts.astype(np.float64) @ self.face_areas()

    def wall_voxel_face_totals(self) -> np.ndarray:
        """Total shared faces per pair (all axes), int64[E]."""
        return self.wall_face_counts.sum(axis=1)

    def adjacency(
        self, min_contact_area: Optional[float] = None, real: bool = True
    ) -> Dict[int, List[int]]:
        """{label: sorted neighbor labels} over original ids.

        ``min_contact_area`` filters pairs by wall area — real units when
        ``real`` else voxel-face count — matching the reference's
        ``neighbors(..., min_contact_area)`` semantics (SURVEY.md §3.3).
        """
        keep = np.ones(self.n_pairs, dtype=bool)
        if min_contact_area is not None:
            meas = self.wall_areas() if real else self.wall_voxel_face_totals()
            keep = meas >= min_contact_area
        nbh: Dict[int, List[int]] = {int(l): [] for l in self.ids}
        for a, b in zip(self.pair_lo[keep], self.pair_hi[keep]):
            la, lb = int(self.ids[a]), int(self.ids[b])
            nbh[la].append(lb)
            nbh[lb].append(la)
        return {k: sorted(v) for k, v in nbh.items()}

    def pair_area_map(self) -> Dict[Tuple[int, int], float]:
        """{(label_a, label_b) a<b in original-id order: real wall area}."""
        areas = self.wall_areas()
        out: Dict[Tuple[int, int], float] = {}
        for k in range(self.n_pairs):
            la, lb = int(self.ids[self.pair_lo[k]]), int(self.ids[self.pair_hi[k]])
            key = (la, lb) if la < lb else (lb, la)
            out[key] = out.get(key, 0.0) + float(areas[k])
        return out

    # ---------------------------------------------------- epidermis/margins
    def l1_segments(self) -> np.ndarray:
        """Segments adjacent to the background segment (the L1 layer)."""
        if self.background_segment is None:
            return np.zeros((0,), dtype=np.int64)
        bg = self.background_segment
        mask_lo = self.pair_lo == bg
        mask_hi = self.pair_hi == bg
        segs = np.concatenate([self.pair_hi[mask_lo], self.pair_lo[mask_hi]])
        return np.unique(segs).astype(np.int64)

    def l1_labels(self) -> List[int]:
        return sorted(int(self.ids[s]) for s in self.l1_segments())

    def epidermis_wall_area(self) -> np.ndarray:
        """Real wall area with the background per segment, f64[N] (0 if none)."""
        out = np.zeros(self.n_labels, dtype=np.float64)
        if self.background_segment is None:
            return out
        bg = self.background_segment
        areas = self.wall_areas()
        for k in range(self.n_pairs):
            a, b = int(self.pair_lo[k]), int(self.pair_hi[k])
            if a == bg:
                out[b] += areas[k]
            elif b == bg:
                out[a] += areas[k]
        return out

    def margin_labels(self) -> List[int]:
        """Labels touching the array boundary (``:: cells_in_image_margins``)."""
        return sorted(int(l) for l in self.ids[self.margin])
