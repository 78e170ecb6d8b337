"""Face-adjacency stencil sweep (chunked engine).

For every axis d, compare the stack with its +1 shift; where labels differ an
adjacent voxel pair (= one shared voxel *face*) exists between the two
labels. One sweep yields everything the reference derives from per-cell
`binary_dilation` loops and per-edge shifted-comparison loops
(``spatial_image_analysis.py :: neighbors / cell_wall_surface /
wall_surfaces``, SURVEY.md §3.3–3.4):

- the full cell-adjacency graph (COO pairs, 6-connectivity in 3D / 4 in 2D),
- per-pair wall *voxel-face counts split by axis* (so anisotropic face areas
  ``(vy·vz, vx·vz, vx·vy)`` can be applied exactly afterwards),
- epidermis / L1 information (pairs containing the background segment),
- labels present on the array margins (``:: cells_in_image_margins``), via a
  cheap extra reduction over the boundary hyperplanes.

Pair identity is the TWO-key tuple (k1 = lo, k2 = hi·4 + axis) merged by a
chunked 2-key sort + segmented-run reduce (``ops.blocked.
_sorted_pair_reduce_keys``) — never a dense lo·N+hi keyspace, so the engine
has no label-count ceiling and no N² accumulators (VERDICT r1 missing #2).
The result is compacted on device to a fixed ``max_pairs`` COO buffer with
an overflow signal, keeping shapes static (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tissue_analysis_tpu.ops.blocked import _IMAX, _sorted_pair_reduce_keys

__all__ = [
    "pair_sweep",
    "adjacency_offsets",
    "connectivity_offsets",
    "default_max_pairs",
    "pair_key_streams",
    "chunked_key_reduce",
    "compact_runs_to_coo",
]


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


def _shifted_views(lab, off):
    """Flattened (a, b) label views for one shift offset."""
    sl_a, sl_b = [], []
    for d in range(lab.ndim):
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


def pair_key_streams(lab, n_labels, offsets, tags):
    """(k1, k2) sort-key streams for shifted-comparison pair entries.

    ``lab`` int32; entries where the two labels differ AND both are real
    (< n_labels — pad voxels carry the label n) get k1 = lo, k2 = hi·4+tag;
    everything else is the (IMAX, IMAX) sentinel. Returns one concatenated
    stream pair.
    """
    n = n_labels
    k1s, k2s = [], []
    for off, tag in zip(offsets, tags):
        a, b = _shifted_views(lab, off)
        valid = (a != b) & (a < n) & (b < n)
        lo = jnp.minimum(a, b)
        hi = jnp.maximum(a, b)
        k1s.append(jnp.where(valid, lo, _IMAX))
        k2s.append(jnp.where(valid, hi * 4 + tag, _IMAX))
    return jnp.concatenate(k1s), jnp.concatenate(k2s)


def chunked_key_reduce(k1, k2, chunk, entry_cap, max_entries):
    """Reduce a voxel-scale (k1, k2) entry stream to per-run totals.

    Two-level: sort each ``chunk``-sized piece and emit ≤ ``entry_cap``
    (run, length) entries, then merge all per-chunk entries with one final
    2-key sort-reduce sliced to ``max_entries``. Returns (k1, k2, total,
    n_runs, chunk_overflow) — ``chunk_overflow`` means some chunk had more
    distinct runs than ``entry_cap`` and the result undercounts (callers
    rerun with a larger ``max_pairs``).
    """
    m = k1.shape[0]
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    if pad:
        k1 = jnp.concatenate([k1, jnp.full((pad,), _IMAX, jnp.int32)])
        k2 = jnp.concatenate([k2, jnp.full((pad,), _IMAX, jnp.int32)])
    k1 = k1.reshape(n_chunks, chunk)
    k2 = k2.reshape(n_chunks, chunk)
    cap = min(chunk, entry_cap)

    def body(ks):
        c1, c2 = ks
        return _sorted_pair_reduce_keys(c1, c2, jnp.ones_like(c1), cap)

    r1, r2, rt, nr = jax.lax.map(body, (k1, k2))
    chunk_ovf = jnp.any(nr > cap)
    f1, f2, ft, n_runs = _sorted_pair_reduce_keys(
        r1.reshape(-1), r2.reshape(-1), rt.reshape(-1), max_entries
    )
    return f1, f2, ft, n_runs, chunk_ovf


def compact_runs_to_coo(k1, k2, total, max_pairs, ndim):
    """Sorted (k1, k2, total) runs -> fixed COO buffers.

    Returns (pair_lo [max_pairs], pair_hi [max_pairs],
    counts [max_pairs, ndim], n_pairs) with pairs in ascending (lo, hi)
    order — the same ordering invariant as the blocked engine.
    """
    valid = k1 < _IMAX
    hi = k2 >> 2
    ax = k2 & 3
    new_pair = valid & jnp.concatenate(
        [jnp.array([True]), (k1[1:] != k1[:-1]) | (hi[1:] != hi[:-1])]
    )
    pos = jnp.cumsum(new_pair.astype(jnp.int32)) - 1
    n_pairs = pos[-1] + 1
    tgt = jnp.where(valid, pos, max_pairs)
    # duplicate tgt writes always carry the same (lo, hi) value ⇒ the
    # scatter-set is deterministic despite duplicates
    pair_lo = jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(k1, mode="drop")
    pair_hi = jnp.zeros((max_pairs,), jnp.int32).at[tgt].set(hi, mode="drop")
    counts = (
        jnp.zeros((max_pairs, ndim), jnp.int32)
        .at[tgt, ax]
        .set(total, mode="drop")
    )
    return pair_lo, pair_hi, counts, n_pairs


def margin_presence(lab, n_labels):
    """bool[n]: label present on any array boundary hyperplane."""
    planes = []
    for d in range(lab.ndim):
        planes.append(jax.lax.index_in_dim(lab, 0, axis=d).reshape(-1))
        planes.append(
            jax.lax.index_in_dim(lab, lab.shape[d] - 1, axis=d).reshape(-1)
        )
    boundary = jnp.concatenate(planes)
    return (
        jax.ops.segment_max(
            jnp.ones_like(boundary), boundary, num_segments=n_labels + 1
        )[:n_labels]
        > 0
    )


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
    lab = dense.astype(jnp.int32)
    k1, k2 = pair_key_streams(lab, n_labels, offsets, (0,) * len(offsets))
    f1, f2, ft, n_runs, chunk_ovf = chunked_key_reduce(
        k1, k2, chunk, max_pairs, max_pairs
    )
    pair_lo, pair_hi, counts, n_pairs = compact_runs_to_coo(
        f1, f2, ft, max_pairs, 1
    )
    overflowed = chunk_ovf | (n_runs > max_pairs)
    n_pairs = jnp.where(
        overflowed, jnp.maximum(n_pairs, 2 * max_pairs), n_pairs
    )
    return pair_lo, pair_hi, counts[:, 0], n_pairs


@partial(jax.jit, static_argnames=("n_labels", "max_pairs", "chunk"))
def pair_sweep(dense: jax.Array, n_labels: int, max_pairs: int, chunk: int = 1 << 21):
    """Compacted COO wall table + margin presence.

    Returns:
      pair_lo  : int32 [max_pairs]      smaller segment id of each pair
      pair_hi  : int32 [max_pairs]      larger segment id
      counts   : int32 [max_pairs, D]   face counts per axis (slots >= n_pairs
                                        are zero)
      n_pairs  : int32 []               number of distinct adjacent pairs;
                                        values > max_pairs signal a rerun
                                        with at least that buffer size
      margin   : bool  [N]              label present on an array boundary face
    """
    ndim = dense.ndim
    n = n_labels
    lab = dense.astype(jnp.int32)
    axes_offs = tuple(
        tuple(1 if d == a else 0 for d in range(ndim)) for a in range(ndim)
    )
    k1, k2 = pair_key_streams(lab, n, axes_offs, tuple(range(ndim)))
    f1, f2, ft, n_runs, chunk_ovf = chunked_key_reduce(
        k1, k2, chunk, 3 * max_pairs, 3 * max_pairs
    )
    pair_lo, pair_hi, counts, n_pairs = compact_runs_to_coo(
        f1, f2, ft, max_pairs, ndim
    )
    overflowed = chunk_ovf | (n_runs > 3 * max_pairs) | (n_pairs > max_pairs)
    n_pairs = jnp.where(
        overflowed, jnp.maximum(n_pairs, 2 * max_pairs), n_pairs
    )
    return pair_lo, pair_hi, counts, n_pairs, margin_presence(lab, n)
