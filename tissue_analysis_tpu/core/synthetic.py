"""Deterministic synthetic segmented stacks for tests and benchmarks.

Recipe from SURVEY.md §4.0 (used for the baseline measurements): Voronoi
labels around random seed points via ``distance_transform_edt`` nearest-seed
indices, labels starting at 2 (label 1 = background), voxels outside a
centered sphere (radius ``0.95·n/2``) set to background — which gives every
stack an epidermis (L1) layer and margin background like a real segmented
meristem stack.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.ndimage as nd

from tissue_analysis_tpu.core.spatial_image import SpatialImage

__all__ = ["voronoi_stack", "two_slab_image", "single_cube_image"]


def voronoi_stack(
    shape: Tuple[int, ...],
    ncells: int,
    seed: int = 0,
    background: int = 1,
    sphere: bool = True,
    voxelsize: Optional[Tuple[float, ...]] = None,
    dtype=np.uint16,
) -> SpatialImage:
    """Synthetic segmented tissue stack (2D or 3D).

    Labels are ``background`` outside the tissue sphere and ``2..ncells+1``
    (minus any empty Voronoi cells) inside.
    """
    shape = tuple(int(s) for s in shape)
    ndim = len(shape)
    rng = np.random.default_rng(seed)
    seeds = np.stack(
        [rng.integers(0, s, size=ncells) for s in shape], axis=1
    )  # [ncells, ndim]

    seed_img = np.zeros(shape, dtype=bool)
    seed_img[tuple(seeds.T)] = True
    # nearest-seed voxel indices -> Voronoi regions
    _, indices = nd.distance_transform_edt(~seed_img, return_indices=True)
    nearest = tuple(indices[d] for d in range(ndim))
    seed_label = np.zeros(shape, dtype=np.int64)
    # last writer wins for coincident seeds — deterministic
    seed_label[tuple(seeds.T)] = np.arange(ncells, dtype=np.int64) + 2
    labels = seed_label[nearest]

    if sphere:
        center = [(s - 1) / 2.0 for s in shape]
        radius = 0.95 * min(shape) / 2.0
        grids = np.ogrid[tuple(slice(0, s) for s in shape)]
        dist2 = sum((g - c) ** 2 for g, c in zip(grids, center))
        labels[dist2 > radius * radius] = background
    if np.issubdtype(dtype, np.integer):
        assert labels.max() <= np.iinfo(dtype).max
    img = labels.astype(dtype)
    if voxelsize is None:
        voxelsize = (1.0,) * ndim
    return SpatialImage(img, voxelsize=voxelsize)


def two_slab_image(
    shape=(8, 8, 8), axis=0, background=None, voxelsize=None
) -> SpatialImage:
    """Two labels split along an axis — the minimal adjacency edge case."""
    img = np.full(shape, 2, dtype=np.uint8)
    half = shape[axis] // 2
    sl = [slice(None)] * len(shape)
    sl[axis] = slice(half, None)
    img[tuple(sl)] = 3
    if background is not None:
        img[(0,) * len(shape)] = background
    return SpatialImage(img, voxelsize=voxelsize or (1.0,) * len(shape))


def single_cube_image(shape=(12, 12, 12), background=1, voxelsize=None) -> SpatialImage:
    """One cubic cell floating in background."""
    img = np.full(shape, background, dtype=np.uint8)
    sl = tuple(slice(s // 4, 3 * s // 4) for s in shape)
    img[sl] = 5
    return SpatialImage(img, voxelsize=voxelsize or (1.0,) * len(shape))
