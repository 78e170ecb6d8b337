"""Module-level wall/morphology helpers.

Parity targets: the module-level functions of ``spatial_image_analysis.py``
(SURVEY.md §2.1 row 6): ``dilation``, ``dilation_by``, ``wall``,
``hollow_out_cells``, ``sort_boundingbox``, ``distance``. The voxel-heavy
ones (``hollow_out_cells``, ``wall``) run as XLA stencils on device instead
of `nd.laplace` / per-label morphology.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dilation",
    "dilation_by",
    "wall",
    "hollow_out_cells",
    "sort_boundingbox",
    "distance",
]


def dilation(slices: Sequence[slice], shape: Optional[Tuple[int, ...]] = None):
    """Grow a bounding-box slice tuple by 1, clamped (``:: dilation``)."""
    return dilation_by(slices, 1, shape)


def dilation_by(
    slices: Sequence[slice], amount: int, shape: Optional[Tuple[int, ...]] = None
):
    """Grow a bounding-box slice tuple by ``amount`` (``:: dilation_by``)."""
    out = []
    for d, s in enumerate(slices):
        start = max(0, s.start - amount)
        stop = s.stop + amount
        if shape is not None:
            stop = min(shape[d], stop)
        out.append(slice(start, stop))
    return tuple(out)


def _interior_mask(lab: jax.Array) -> jax.Array:
    """True where all face neighbors share the voxel's label (array edges are
    never interior — matching wall extraction that keeps the tissue surface)."""
    interior = jnp.ones(lab.shape, dtype=bool)
    for d in range(lab.ndim):
        size = lab.shape[d]
        a = jax.lax.slice_in_dim(lab, 0, size - 1, axis=d)
        b = jax.lax.slice_in_dim(lab, 1, size, axis=d)
        same = a == b
        pad_lo = [(0, 0)] * lab.ndim
        pad_hi = [(0, 0)] * lab.ndim
        pad_lo[d] = (0, 1)
        pad_hi[d] = (1, 0)
        interior &= jnp.pad(same, pad_lo, constant_values=False)
        interior &= jnp.pad(same, pad_hi, constant_values=False)
    return interior


@jax.jit
def _hollow(lab: jax.Array, background: jax.Array) -> jax.Array:
    return jnp.where(_interior_mask(lab), background.astype(lab.dtype), lab)


def hollow_out_cells(image, background: int, verbose: bool = False):
    """Keep only wall voxels; interior voxels become background
    (``:: hollow_out_cells``, SURVEY.md §2.2 `nd.laplace` row)."""
    arr = np.asarray(image)
    out = np.asarray(_hollow(jnp.asarray(arr), jnp.asarray(background)))
    if verbose:
        kept = int((out != background).sum())
        print(f"hollow_out_cells: kept {kept} wall voxels")
    try:  # preserve SpatialImage metadata when present
        from tissue_analysis_tpu.core.spatial_image import SpatialImage

        return SpatialImage(out, voxelsize=getattr(image, "voxelsize", None))
    except ValueError:  # pragma: no cover
        return out


@jax.jit
def _wall_mask(lab: jax.Array, label_id: jax.Array) -> jax.Array:
    mask = lab == label_id
    return mask & ~_interior_mask(jnp.where(mask, lab, -1))


def wall(mask_img, label_id: int) -> np.ndarray:
    """Boundary-voxel mask of one label (``:: wall``)."""
    arr = jnp.asarray(np.asarray(mask_img))
    return np.asarray(_wall_mask(arr, jnp.asarray(label_id, arr.dtype)))


def sort_boundingbox(boundingboxes, labels=None, reverse: bool = True):
    """Labels sorted by bounding-box voxel volume (``:: sort_boundingbox`` [M])."""
    if isinstance(boundingboxes, dict):
        items = boundingboxes.items() if labels is None else (
            (l, boundingboxes[l]) for l in labels
        )
    else:
        items = enumerate(boundingboxes)

    def bbox_size(sl):
        if sl is None:
            return -1
        return math.prod(s.stop - s.start for s in sl)

    return [l for l, sl in sorted(items, key=lambda kv: bbox_size(kv[1]), reverse=reverse)]


def distance(pt_a, pt_b) -> float:
    """Euclidean distance between two points (``:: distance``)."""
    a = np.asarray(pt_a, dtype=np.float64)
    b = np.asarray(pt_b, dtype=np.float64)
    return float(np.sqrt(np.sum((a - b) ** 2)))
