"""Face-adjacency stencil sweep.

For every axis d, compare the stack with its +1 shift; where labels differ an
adjacent voxel pair (= one shared voxel *face*) exists between the two
labels. Segment-summing encoded pair keys yields — in ONE sweep — everything
the reference derives from per-cell `binary_dilation` loops and per-edge
shifted-comparison loops (``spatial_image_analysis.py :: neighbors /
cell_wall_surface / wall_surfaces``, SURVEY.md §3.3–3.4):

- the full cell-adjacency graph (COO pairs, 6-connectivity in 3D / 4 in 2D),
- per-pair wall *voxel-face counts split by axis* (so anisotropic face areas
  ``(vy·vz, vx·vz, vx·vy)`` can be applied exactly afterwards),
- epidermis / L1 information (pairs containing the background segment),
- labels present on the array margins (``:: cells_in_image_margins``), via a
  cheap extra reduction over the boundary hyperplanes.

Pair keys live in the dense N² keyspace (``lo·N + hi``); the result is
compacted on device to a fixed ``max_pairs`` COO buffer with an overflow
flag, keeping shapes static (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "pair_sweep",
    "adjacency_offsets",
    "connectivity_offsets",
    "default_max_pairs",
]

_INT32_MAX = 2**31 - 1


def default_max_pairs(n_labels: int) -> int:
    # ~13.4 edges/cell measured on the 512³ Voronoi stack (SURVEY.md §0.1);
    # 32·N leaves generous headroom, floor keeps tiny tests roomy.
    return max(1024, 32 * n_labels)


def connectivity_offsets(ndim: int, connectivity: int):
    """Canonical half-space shift offsets for an ndim cross/box neighborhood.

    connectivity follows ``nd.generate_binary_structure`` semantics: 1 =
    faces only (the reference default, SURVEY.md §3.3), ndim = full box
    (26-connectivity in 3D). Each unordered voxel-pair direction appears
    once (first nonzero component positive).
    """
    import itertools

    offs = []
    for off in itertools.product((-1, 0, 1), repeat=ndim):
        if all(o == 0 for o in off):
            continue
        order = sum(abs(o) for o in off)
        if order > connectivity:
            continue
        first = next(o for o in off if o != 0)
        if first < 0:
            continue  # canonical representative of the ± pair
        offs.append(off)
    return tuple(offs)


@partial(jax.jit, static_argnames=("n_labels", "offsets", "max_pairs", "chunk"))
def adjacency_offsets(
    dense: jax.Array,
    n_labels: int,
    offsets,
    max_pairs: int,
    chunk: int = 1 << 21,
):
    """Label-pair contacts for arbitrary shift offsets (18/26-connectivity).

    Parity target: ``spatial_image_analysis.py :: neighbors`` with a
    non-default structuring element (``nd.generate_binary_structure(3, 2|3)``).
    Returns (pair_lo, pair_hi, contact_counts [max_pairs], n_pairs) over
    dense segment ids; counts are voxel-pair contacts (diagonal contacts
    carry no physical face area — ``min_contact_area`` filtering stays
    face-based, matching the oracle).
    """
    ndim = dense.ndim
    n = n_labels
    keyspace = n * n
    if keyspace + 1 > _INT32_MAX:
        raise ValueError("n_labels exceeds the dense pair keyspace")
    lab = dense.astype(jnp.int32)

    def shifted_views(off):
        sl_a, sl_b = [], []
        for d in range(ndim):
            if off[d] == 1:
                sl_a.append(slice(0, lab.shape[d] - 1))
                sl_b.append(slice(1, lab.shape[d]))
            elif off[d] == -1:
                sl_a.append(slice(1, lab.shape[d]))
                sl_b.append(slice(0, lab.shape[d] - 1))
            else:
                sl_a.append(slice(None))
                sl_b.append(slice(None))
        return lab[tuple(sl_a)].reshape(-1), lab[tuple(sl_b)].reshape(-1)

    acc = jnp.zeros((keyspace,), jnp.int32)
    for off in offsets:
        a, b = shifted_views(off)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        key = jnp.where(a != b, lo * n + hi, keyspace)
        v = key.shape[0]
        n_chunks = -(-v // chunk)
        pad = n_chunks * chunk - v
        key = jnp.concatenate([key, jnp.full((pad,), keyspace, jnp.int32)])
        key = key.reshape(n_chunks, chunk)

        def body(carry, k):
            t = jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.int32), k, num_segments=keyspace + 1
            )
            return carry + t[:keyspace], None

        acc, _ = jax.lax.scan(body, acc, key)

    nz = acc > 0
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1
    tgt = jnp.where(nz, pos, max_pairs)
    keys = jnp.arange(keyspace, dtype=jnp.int32)
    pair_lo = jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(keys // n, mode="drop")
    pair_hi = jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(keys % n, mode="drop")
    counts = jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(acc, mode="drop")
    return pair_lo, pair_hi, counts, n_pairs


@partial(jax.jit, static_argnames=("n_labels", "max_pairs", "chunk"))
def pair_sweep(dense: jax.Array, n_labels: int, max_pairs: int, chunk: int = 1 << 21):
    """Compacted COO wall table + margin presence.

    Returns:
      pair_lo  : int32 [max_pairs]      smaller segment id of each pair
      pair_hi  : int32 [max_pairs]      larger segment id
      counts   : int32 [max_pairs, D]   face counts per axis (slots >= n_pairs
                                        are zero)
      n_pairs  : int32 []               number of distinct adjacent pairs
      margin   : bool  [N]              label present on an array boundary face
    """
    ndim = dense.ndim
    n = n_labels
    keyspace = n * n
    if keyspace + 1 > _INT32_MAX:
        raise ValueError(
            f"n_labels={n} exceeds the dense N² pair keyspace; "
            "hash-table pair path not yet implemented"
        )
    lab = dense.astype(jnp.int32)

    def axis_counts(d):
        size = lab.shape[d]
        a = jax.lax.slice_in_dim(lab, 0, size - 1, axis=d).reshape(-1)
        b = jax.lax.slice_in_dim(lab, 1, size, axis=d).reshape(-1)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        key = jnp.where(a != b, lo * n + hi, keyspace)
        v = key.shape[0]
        n_chunks = -(-v // chunk)
        pad = n_chunks * chunk - v
        key = jnp.concatenate([key, jnp.full((pad,), keyspace, jnp.int32)])
        key = key.reshape(n_chunks, chunk)

        def body(acc, k):
            t = jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.int32), k, num_segments=keyspace + 1
            )
            return acc + t[:keyspace], None

        acc0 = jnp.zeros((keyspace,), jnp.int32)
        acc, _ = jax.lax.scan(body, acc0, key)
        return acc

    per_axis = [axis_counts(d) for d in range(ndim)]
    tot = per_axis[0]
    for c in per_axis[1:]:
        tot = tot + c

    nz = tot > 0
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1 if keyspace > 0 else jnp.int32(0)
    tgt = jnp.where(nz, pos, max_pairs)
    keys = jnp.arange(keyspace, dtype=jnp.int32)
    pair_lo = (
        jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(keys // n, mode="drop")
    )
    pair_hi = (
        jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(keys % n, mode="drop")
    )
    counts = (
        jnp.zeros((max_pairs, ndim), jnp.int32)
        .at[tgt]
        .set(jnp.stack(per_axis, axis=1), mode="drop")
    )

    # margin presence: labels on any boundary hyperplane
    planes = []
    for d in range(ndim):
        planes.append(jax.lax.index_in_dim(lab, 0, axis=d).reshape(-1))
        planes.append(jax.lax.index_in_dim(lab, lab.shape[d] - 1, axis=d).reshape(-1))
    boundary = jnp.concatenate(planes)
    margin = (
        jax.ops.segment_max(
            jnp.ones_like(boundary), boundary, num_segments=n + 1
        )[:n]
        > 0
    )
    return pair_lo, pair_hi, counts, n_pairs, margin
