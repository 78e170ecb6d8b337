"""LabeledStack — the device-side representation of a segmented image.

SURVEY.md §7.1: a pytree of dense ``int32`` labels plus the physical voxel
size and the dense-relabel table (original label ids ↔ ``0..N-1``). Dense
relabeling happens once at ingest; every device sweep then works on the
compact segment space, with the background pinned to segment 0 when present.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LabeledStack"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LabeledStack:
    """Dense-relabeled voxel stack.

    Attributes
    ----------
    dense:
        ``int32[...]`` device array of segment ids in ``0..n_labels-1``
        (2D ``[Y,X]`` or 3D ``[Z,Y,X]``).
    ids:
        ``int64[n_labels]`` host array mapping segment id -> original label.
        Sorted ascending, so if a background label exists and is the smallest
        id it is segment... (no: background is explicitly pinned to 0, see
        ``from_array``).
    voxelsize:
        physical size per axis, same order as array axes.
    background_segment:
        segment id of the background label, or ``None`` if the background
        label does not occur in the image.
    """

    dense: jax.Array
    ids: np.ndarray
    voxelsize: Tuple[float, ...]
    background_segment: Optional[int]

    # -- pytree plumbing (ids/voxelsize/background are static aux data) -----
    def tree_flatten(self):
        aux = (tuple(self.ids.tolist()), self.voxelsize, self.background_segment)
        return (self.dense,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        ids, voxelsize, background_segment = aux
        return cls(children[0], np.asarray(ids, np.int64), voxelsize, background_segment)

    # -----------------------------------------------------------------------
    @property
    def n_labels(self) -> int:
        return int(self.ids.shape[0])

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.dense.shape)

    @property
    def ndim(self) -> int:
        return self.dense.ndim

    @property
    def background_id(self) -> Optional[int]:
        if self.background_segment is None:
            return None
        return int(self.ids[self.background_segment])

    @classmethod
    def from_array(
        cls,
        image,
        voxelsize: Optional[Tuple[float, ...]] = None,
        background: Optional[int] = None,
    ) -> "LabeledStack":
        """Ingest a labeled image (host ndarray or SpatialImage).

        Labels are densified with ``np.unique``; if ``background`` is present
        in the image its segment is swapped to position 0 so background-aware
        sweeps (epidermis/L1 detection) can address it statically.
        """
        arr = np.asarray(image)
        if voxelsize is None:
            voxelsize = getattr(image, "voxelsize", None)
        if voxelsize is None:
            voxelsize = (1.0,) * arr.ndim
        voxelsize = tuple(float(v) for v in voxelsize)
        if len(voxelsize) != arr.ndim:
            raise ValueError("voxelsize length must equal image ndim")
        if arr.ndim not in (2, 3):
            raise ValueError(f"expected 2D or 3D labeled image, got ndim={arr.ndim}")
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError(
                f"labeled images must have an integer dtype, got {arr.dtype}"
            )

        from tissue_analysis_tpu import native
        from tissue_analysis_tpu.utils import timing

        with timing.stage("ingest: dense relabel", int(arr.size)):
            nat = native.relabel(arr, background)
        if nat is not None:
            # C++ two-pass relabel (same segment convention as below:
            # ids ascending, background swapped to position 0)
            dense, ids, background_segment = nat
        else:
            ids, dense = np.unique(arr, return_inverse=True)
            ids = ids.astype(np.int64)
            dense = dense.reshape(arr.shape).astype(np.int32)

            background_segment = None
            if background is not None:
                pos = np.searchsorted(ids, background)
                if pos < ids.shape[0] and ids[pos] == background:
                    if pos != 0:
                        # swap segment `pos` <-> 0 in both table and image
                        remap = np.arange(ids.shape[0], dtype=np.int32)
                        remap[0], remap[pos] = pos, 0
                        dense = remap[dense]
                        ids = ids.copy()
                        ids[0], ids[pos] = ids[pos], ids[0]
                    background_segment = 0

        if ids.shape[0] <= 0xFFFF:
            # segment ids (and the pad sentinel n_labels) fit uint16 — halve
            # the host->device transfer; device sweeps upcast lazily
            # (copy=False: the native relabel already emits uint16)
            dense = dense.astype(np.uint16, copy=False)
        with timing.stage("ingest: host->device transfer", int(arr.size)):
            dense_dev = jnp.asarray(dense)

        return cls(
            dense=dense_dev,
            ids=ids,
            voxelsize=voxelsize,
            background_segment=background_segment,
        )

    def segment_of(self, label: int) -> Optional[int]:
        """Segment id of an original label, or None if absent."""
        pos = int(np.searchsorted(self.ids, label))
        if pos < self.n_labels and int(self.ids[pos]) == label:
            return pos
        # background may have been swapped away from its sorted position
        hits = np.nonzero(self.ids == label)[0]
        return int(hits[0]) if hits.size else None
