"""Pallas TPU kernel: the whole per-block pipeline fused in VMEM.

The XLA blocked engine (ops/blocked.py) materializes the per-block one-hot
tensor in HBM and re-reads it for the dictionary pass, three marginals and
six pair-matmul slices (~100 GB of HBM traffic at 512³). This kernel keeps
everything for one block resident in VMEM and reads each voxel from HBM
exactly once:

  per grid step (one 8×16×128 block, K = 16384 voxels), kernel-v2
  (`_kernel_factory_v2`, the default-block path — v1 below is kept for
  other block shapes and n ≥ 2¹⁶):
    1. dictionary extraction — L/4 iterations of masked min+max over the
       even and odd label groups (4 independent reductions per step; the
       serial chain, not VPU throughput, is the cost), dictionary built by
       iota-select (no dynamic stores)
    2. one-hot parts [L, K/8] bf16 per z-plane against the dictionary
    3. LOCAL integer moments — z-weighted marginals (Σ parts, Σ s·parts,
       Σ s²·parts — all < 256, bf16-exact) contracted against a narrow
       static weight/selector table in ONE [3L, K/8]-wide MXU dot
       (exact f32 sums < 2²⁴); bbox supports ride the same dot
    4. wall-pair counts — the three +1-voxel neighbor arrays are rebuilt
       IN-KERNEL (sublane shift for z, lane shift + boundary patches for
       y/x, patches from a compact 2-row `extras` input holding the three
       next-block planes), then ONE [L, K]×[3L, K]ᵀ face dot — cross-block
       faces included, no seam pass, no shifted stack copies in HBM

  v1 (any block shape): same pipeline but the shifted neighbor stacks are
  materialized by XLA and every block reads four input copies; moments and
  bbox ride one wide [L, K]×[K, 272] dot

Downstream (pure XLA, tiny): the same segment combine / top_k pair
compaction / sort-reduce as the blocked engine. v2 reconstructs the exact
global-coordinate split moment columns IN-KERNEL from scalar-prefetched
block offsets (the XLA reconstruction stage measured ~21 ms of narrow
elementwise passes at 512³); v1 still reconstructs in XLA
(`_reconstruct_rows`). Outputs are bit-identical to the other engines
(enforced by tests).

Static bounds (checked, `_check_static_pallas`): the compact 5-piece
reconstruction holds to ~1024 voxels per axis; beyond that the engine
switches to the 8-piece offset-split contract (`_moment_pieces`,
wide=True) — exact to ~46k voxels per axis within a 2^16-block budget
(e.g. the 4096² 2D lift, 2048²-wide out-of-core slabs). Only shapes
exceeding BOTH fall back to the XLA blocked engine.
"""

from __future__ import annotations

import collections
import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tissue_analysis_tpu.ops import blocked
from tissue_analysis_tpu.ops.blocked import (
    _IMAX,
    _SPLIT,
    _blockify,  # noqa: F401 (re-exported for tests)
    _compact_pair_mats,
    _grid,
    _group_pad,
    _pad_to_blocks,
    _sorted_pair_reduce,
)

__all__ = ["PallasConfig", "pallas_sweep", "assemble_moments_pallas"]

_WSHIFT = 7  # weight parts < 2^7: bf16-exact, f32 sums < 2^24
_WMASK = (1 << _WSHIFT) - 1
# feature order in the weight table (local coords, lo/hi per feature):
# 1, z, z², y, y², zy, x, x², zx, yx
_N_FEATS = 10
_QSHIFT = 9  # offset-product split in the reconstruction

# Debug override for timing experiments ONLY: caps the dictionary
# extraction chain at this many steps (results become incomplete and the
# overflow flag fires — never set outside perf-attribution scripts).
_DICT_STEPS = None
# timing-only A/B knobs for `_dict_extract_rows` (results garbage when
# _ROWS_PHASE2 is False — same contract as _DICT_STEPS):
_ROWS_PHASE2 = True  # False: skip the phase-2 chain (time phase 1 alone)
_ROWS_SEP = False  # True: separate min/max reductions (no in-loop concat)
_CHAIN_VEC = False  # True: vectorized band-collapse chain (A/B; P=1, G=2)

# Dictionary partition width: labels are hashed into G groups extracted
# independently, so the serial extraction chain is L/(2G) dependent steps
# (the chain, not VPU throughput, is the kernel's cost — measured
# ~2.8 ms/step at 512³ with G=2, ~3.7 with G=4, ~5.6 with G=8).
#
# G is CAPACITY-LIMITED, not speed-limited: overflow fires when one group
# exceeds L/G distinct labels, and 23 labels (the measured per-block p100
# at 512³) thrown into G≥4 bins exceed L/G = 8 with near-certainty
# somewhere among 8192 blocks (measured max loads: G=4 → 10-12, G=8 → 7
# vs capacities 8 / 4) — the engine's retry would double L and lose more
# than the shorter chain saves. G=2 keeps capacity 16 ≥ the measured max
# load (15 with the multiplicative hash) at the default L=32.
_DICT_GROUPS = 2


def _dict_extract(v_all, L, n, P: int = 1):
    """Iterative masked min/max dictionary extraction over ``v_all``.

    Shared by kernel v1 and v2 (bit-identical downstream contract). Labels
    >= n (fill/pad) never take a slot. The label set is partitioned into
    ``_DICT_GROUPS`` groups on a multiplicative (Fibonacci) hash — top
    bits of ``v · 2654435761``, decorrelated from structured id sets like
    all-even labels after 2× downsampling, unlike a plain parity split
    (ADVICE r2) — and each step extracts the
    min AND max of every group: 2G mutually independent reductions per
    step, a serial chain of L/(2G) steps. When ≤1 label remains in a group
    max == min (or min = _IMAX, max = -1 when empty) and the max slot
    stays _IMAX via the x > m guard — no duplicate dictionary entries,
    which would double-count in the one-hot dots. Slot ORDER is arbitrary,
    which is fine: every consumer (one-hot compare, pair compaction,
    global segment-combine, final pair sort) is slot-order agnostic, so
    output tables stay bit-identical. Overflow fires when ONE group
    exceeds L/G distinct labels — earlier than the plain ">L distinct"
    rule for hash-skewed sets (rare by construction); the host retry
    doubles L either way. STATICALLY UNROLLED: a fori_loop here carries i1
    masks whose Mosaic layouts disagree between loop entry and body and
    fail to compile.

    ``P`` > 1 extracts the dictionaries of P independent blocks in the
    SAME serial chain (kernel-v2's block packing): ``v_all`` is [P·R, K8]
    with block p in rows p·R..(p+1)·R-1, and every step extracts the
    min/max of all P·G (block, group) bands at once — the chain is still
    L/(2G) steps but each step serves P blocks, so the per-block latency
    (the kernel's dominant cost, not VPU throughput) divides by P. Slot
    values per block are EXACTLY the P=1 slots (each band's reductions
    only see its own block's rows), so outputs stay bit-identical.

    Returns (ids [P·L, 1] int32 with _IMAX in empty slots — block p in
    rows p·L..(p+1)·L-1 — and ovf [P·L, 1], the step-global overflow
    flag: any block overflowing triggers the same host retry).
    """
    # v_all row guard: _dict_extract_rows phase 2 re-enters here with the
    # [M, 2·steps] candidate array (M = S16·Rb rows ≫ 16), which the vec
    # chain's R ≤ 16 layout cannot carry (ADVICE r4) — scalar chain then
    if (
        _CHAIN_VEC and P == 1 and _DICT_GROUPS == 2 and L % 4 == 0
        and v_all.shape[0] <= 16
    ):
        return _dict_extract_vec(v_all, L, n)
    G = _DICT_GROUPS
    # degrade for small L (overflow-path tests use L down to 4): largest
    # power-of-two group count <= _DICT_GROUPS with whole slot segments
    while G > 1 and (L % (2 * G) != 0):
        G //= 2
    assert L % (2 * G) == 0, "dictionary size must be even"
    seg = L // G
    full_steps = seg // 2
    steps = full_steps if _DICT_STEPS is None else min(_DICT_STEPS, full_steps)
    R = v_all.shape[0] // P
    vps = [v_all[p * R:(p + 1) * R] for p in range(P)]
    sub_l = jax.lax.broadcasted_iota(jnp.int32, (P * L, 1), 0)
    mask = (v_all == v_all) & (v_all < n)
    if G == 1:
        gid = jnp.zeros_like(v_all)
    else:
        gid = jax.lax.shift_right_logical(
            (v_all.astype(jnp.uint32) * jnp.uint32(2654435761)),
            jnp.uint32(32 - (G.bit_length() - 1)),
        ).astype(jnp.int32)
    masks = [mask & (gid == g) for g in range(G)]
    ids = jnp.full((P * L, 1), _IMAX, jnp.int32)
    # FUSED step reductions: the per-step cost is the LATENCY of the
    # full-array scalar reductions, not VPU throughput (measured
    # ~2.8 ms/step at G=2 with four separate jnp.min/jnp.max calls). All
    # 2G·P extremes of a step come out of ONE wide lane-reduction instead:
    # stack [v, -v] per (block, group) along sublanes ([P·2G·R, K8]; min
    # of -v == -max of v), lane-reduce once to [P·2G·R, 1], then collapse
    # each R-row band with tiny reductions. Bit-identical slots: the
    # per-band m/x scalars and the x > m dedupe guard are unchanged.
    vpm = jnp.concatenate(
        [s for p in range(P) for _ in range(G) for s in (vps[p], -vps[p])],
        axis=0,
    )  # [P·2G·R, K8]
    vv = jnp.concatenate(
        [vps[p] for p in range(P) for _ in range(2 * G)], axis=0
    )
    # the live mask is carried as int32 0/1: sublane-concatenating i1
    # arrays asks Mosaic for an unsupported vreg bitcast (i1 -> i32) and
    # fails to compile on hardware (interpret mode accepts it)
    msk = jnp.concatenate(
        [
            jnp.where(masks[g][p * R:(p + 1) * R], 1, 0)
            for p in range(P)
            for g in range(G)
            for _ in range(2)
        ],
        axis=0,
    )
    band = jax.lax.broadcasted_iota(jnp.int32, (P * 2 * G * R, 1), 0) // R
    for l in range(steps):
        rowmin = jnp.min(
            jnp.where(msk != 0, vpm, _IMAX), axis=1, keepdims=True
        )
        mb = jnp.full((P * 2 * G * R, 1), _IMAX, jnp.int32)
        xb = jnp.full((P * 2 * G * R, 1), _IMAX, jnp.int32)
        for p in range(P):
            for g in range(G):
                bidx = p * 2 * G + 2 * g
                m = jnp.min(jnp.where(band == bidx, rowmin, _IMAX))
                x = -jnp.min(jnp.where(band == bidx + 1, rowmin, _IMAX))
                ids = jnp.where(sub_l == p * L + g * seg + l, m, ids)
                ids = jnp.where(
                    sub_l == p * L + (g + 1) * seg - 1 - l,
                    jnp.where(x > m, x, _IMAX),
                    ids,
                )
                in_g = (band == bidx) | (band == bidx + 1)
                mb = jnp.where(in_g, m, mb)
                xb = jnp.where(in_g, x, xb)
        msk = jnp.where((vv != mb) & (vv != xb), msk, 0)
    ovf = jnp.broadcast_to(
        jnp.any(msk != 0).astype(jnp.int32).reshape(1, 1), (P * L, 1)
    )
    return ids, ovf


def _dict_extract_vec(v_all, L, n):
    """Vectorized band-collapse variant of the serial chain (A/B leg).

    Identical extraction ORDER to `_dict_extract` at G=2/P=1 — same
    min/max per hash group per step, same ``x > m`` dedupe guard, same
    slot positions — so ids are bit-identical. The difference is purely
    how per-band extremes are materialized: the chain pulls 2G SCALARS
    out of vregs per step (sublane+lane collapse, scalar broadcast back
    — the measured ~2.8 ms/step fixed cost, `tpu_dictrows_ab.py` round
    4), while this keeps them as [4R, 1] VECTORS via masked bidirectional
    sublane-roll reductions, and assembles the [L, 1] ids once at the end
    with a diagonal lane select. Roll masks are static (band layout is
    static); band rows are contiguous so distances 1/2/4/8 with both
    directions cover any band of <= 16 rows with all path intermediates
    in-band.
    """
    R = v_all.shape[0]
    K8 = v_all.shape[1]
    assert R <= 16, "band roll-reduce covers <= 16 rows"
    G = 2
    seg = L // G
    full_steps = seg // 2
    steps = (
        full_steps if _DICT_STEPS is None else min(_DICT_STEPS, full_steps)
    )
    M4 = 4 * R
    mask = v_all < n
    gid = jax.lax.shift_right_logical(
        (v_all.astype(jnp.uint32) * jnp.uint32(2654435761)),
        jnp.uint32(31),
    ).astype(jnp.int32)
    m0 = jnp.where(mask & (gid == 0), 1, 0)
    m1 = jnp.where(mask & (gid == 1), 1, 0)
    vpm = jnp.concatenate([v_all, -v_all, v_all, -v_all], axis=0)
    vv = jnp.concatenate([v_all] * 4, axis=0)
    msk = jnp.concatenate([m0, m0, m1, m1], axis=0)  # [4R, K8] int32
    iota4 = jax.lax.broadcasted_iota(jnp.int32, (M4, 1), 0)
    band = iota4 // R
    odd = (band % 2) == 1
    # roll source-band masks from iota arithmetic: pallas kernels may not
    # capture host-built constants, so derive them traced
    dists = [d for d in (1, 2, 4, 8) if d < R]
    same_masks = [
        (
            d,
            ((iota4 + (M4 - d)) % M4) // R == band,
            ((iota4 + d) % M4) // R == band,
        )
        for d in dists
    ]

    def band_allmin(col):
        # backward rolls as cyclic complements: pltpu.roll rejects
        # negative shifts on the hardware lowering path (interpret mode
        # accepts them — same trap class as CLAUDE.md's lane-concat)
        x = col
        for d, fm, bm in same_masks:
            x = jnp.minimum(
                x, jnp.where(fm, pltpu.roll(x, d, 0), _IMAX)
            )
            x = jnp.minimum(
                x, jnp.where(bm, pltpu.roll(x, M4 - d, 0), _IMAX)
            )
        return x

    lane_c = jax.lax.broadcasted_iota(jnp.int32, (M4, 2 * steps), 1)
    cand = jnp.full((M4, 2 * steps), _IMAX, jnp.int32)
    for l in range(steps):
        rowmin = jnp.min(
            jnp.where(msk != 0, vpm, _IMAX), axis=1, keepdims=True
        )  # [4R, 1]
        bmin = band_allmin(rowmin)
        # band-pair alignment: every row gets its GROUP's min (from the
        # even band) and max (negated, from the odd band)
        mb = jnp.where(odd, pltpu.roll(bmin, R, 0), bmin)
        xb = -jnp.where(odd, bmin, pltpu.roll(bmin, M4 - R, 0))
        cand = jnp.where(lane_c == 2 * l, mb, cand)
        cand = jnp.where(
            lane_c == 2 * l + 1, jnp.where(xb > mb, xb, _IMAX), cand
        )
        msk = jnp.where((vv == mb) | (vv == xb), 0, msk)
    ovf = jnp.any(msk != 0).astype(jnp.int32)
    # ids assembly: rows of band 2g all hold group g's extremes; tile the
    # R rows up to seg and select the step's column on the diagonal
    blocks = []
    for g in range(G):
        bandrows = cand[2 * g * R:(2 * g + 1) * R]
        reps = -(-seg // R)
        blocks.append(jnp.concatenate([bandrows] * reps, axis=0)[:seg])
    cand_al = jnp.concatenate(blocks, axis=0)  # [L, 2*steps]
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * steps), 0) % seg
    colpos = jax.lax.broadcasted_iota(jnp.int32, (L, 2 * steps), 1)
    colsel = jnp.where(
        rowpos < steps, 2 * rowpos, 2 * (seg - 1 - rowpos) + 1
    )
    haspick = (rowpos < steps) | (rowpos >= seg - steps)
    pick = (colpos == colsel) & haspick
    ids = jnp.sum(
        jnp.where(pick, cand_al, 0), axis=1, keepdims=True, dtype=jnp.int32
    )
    ids = jnp.where(
        (rowpos[:, :1] < steps) | (rowpos[:, :1] >= seg - steps), ids, _IMAX
    )
    return ids, jnp.broadcast_to(ovf.reshape(1, 1), (L, 1))


def _dict_extract_rows(v_all, L, n, steps, P: int = 1):
    """Two-phase dictionary extraction (VERDICT r3 next #7).

    Phase 1 harvests per-x-row candidates: ``v_all``'s [·, K8] rows are
    sliced into 128-lane x-row segments (the natural spatially-coherent
    unit — a 128-voxel x-row crosses few cells: measured on the 512³
    fixture mean 3.8 / p99 9 / p100 13 distinct labels vs 23 for a whole
    block) and ``steps`` static rounds extract the masked min AND max of
    every segment at once — a [2M, 128] lane-reduction per round instead
    of the chain's [2G·R, K8] group-masked reduction, and the rounds
    needed are ceil(max-per-row-distinct / 2) ≈ ceil(13/2) = 7, vs the
    chain's L/(2G) = 8 rounds over 4× the data.

    Phase 2 runs the UNCHANGED serial chain (`_dict_extract`) on the tiny
    [M, 2·steps] candidate array. If phase 1 did not overflow, the
    candidate multiset's distinct-value SET equals the block's — and
    `_dict_extract`'s slot assignment depends only on that set (hash
    groups + min/max order, multiplicity-free) — so the returned ids are
    BIT-IDENTICAL to the direct chain's, and every downstream consumer is
    untouched.

    Overflow: a row with more than 2·``steps`` distinct labels leaves
    live entries in the phase-1 mask; the flag merges into the standard
    dict-overflow retry (`grow_dict` doubles ``dict_rows`` along with L).

    Mosaic notes (CLAUDE.md traps): lane slices are 128-aligned (offset
    slices silently mis-lower); masks carried as int32 (i1 sublane concat
    fails to compile on hardware); phase-1 is statically unrolled like the
    chain.
    """
    R = v_all.shape[0]
    K8 = v_all.shape[1]
    S16 = K8 // 128
    Rb = R // P
    # restack to x-rows, block-major so _dict_extract's P bands stay
    # contiguous per block: [P · Rb · S16, 128]
    rows = jnp.concatenate(
        [
            v_all[p * Rb:(p + 1) * Rb, 128 * j:128 * (j + 1)]
            for p in range(P)
            for j in range(S16)
        ],
        axis=0,
    )
    M = rows.shape[0]
    msk = jnp.where(rows < n, 1, 0)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (M, 2 * steps), 1)
    cand = jnp.full((M, 2 * steps), _IMAX, jnp.int32)
    if not _ROWS_SEP:
        stacked = jnp.concatenate([rows, -rows], axis=0)  # [2M, 128]
    for s in range(steps):
        if _ROWS_SEP:
            m = jnp.min(
                jnp.where(msk != 0, rows, _IMAX), axis=1, keepdims=True
            )
            x = jnp.max(
                jnp.where(msk != 0, rows, -1), axis=1, keepdims=True
            )
            x = jnp.where(x < 0, _IMAX - 1, x)  # empty row -> no max cand
        else:
            msks = jnp.concatenate([msk, msk], axis=0)
            ext = jnp.min(
                jnp.where(msks != 0, stacked, _IMAX), axis=1, keepdims=True
            )  # [2M, 1]
            m = ext[:M]
            x = -ext[M:]
        # empty row: m = _IMAX, x < m -> both guards write _IMAX;
        # single remaining value: x == m -> max slot stays _IMAX (no
        # duplicate candidates within a row)
        cand = jnp.where(lane_c == 2 * s, m, cand)
        cand = jnp.where(
            lane_c == 2 * s + 1, jnp.where(x > m, x, _IMAX), cand
        )
        msk = jnp.where((rows == m) | (rows == x), 0, msk)
    ovf1 = jnp.any(msk != 0).astype(jnp.int32)
    if not _ROWS_PHASE2:  # timing-only: skip the chain (garbage ids)
        ids = cand[:P * L, :1]
        return ids, jnp.broadcast_to(ovf1.reshape(1, 1), (P * L, 1))
    ids, ovf2 = _dict_extract(cand, L, n, P)
    return ids, jnp.maximum(ovf2, ovf1)


def grow_dict(cfg):
    """The dict-overflow retry: double every dictionary capacity knob.

    One helper so all retry sites (engine, sharded, streaming) stay in
    sync — a phase-1 row overflow in `_dict_extract_rows` needs
    ``dict_rows`` doubled, not just L, or the retry would loop."""
    return dataclasses.replace(
        cfg,
        max_labels_per_block=cfg.max_labels_per_block * 2,
        seam_max_labels=cfg.seam_max_labels * 2,
        dict_rows=cfg.dict_rows * 2 if cfg.dict_rows else 0,
    )


@dataclasses.dataclass(frozen=True)
class PallasConfig:
    block: Tuple[int, int, int] = (8, 16, 128)
    # L (measured p100 = 22 on 512³ stacks). NB: the kernel's dictionary is
    # partitioned into _DICT_GROUPS hashed groups (see _dict_extract), so a
    # block whose distinct labels skew to one hash group overflows at L/G
    # in that group; the rerun-larger retry doubles L — correct, but one
    # extra compile. The mixed-bit hash decorrelates the groups from
    # structured id sets (dense relabeled AND raw label values, e.g.
    # all-even after 2× downsampling), so skew is rare by construction.
    max_labels_per_block: int = 32
    # kp for the XLA compaction stage: one int, or a per-axis (z, y, x)
    # tuple — the three face directions have very different pair densities
    # (a block crosses 8 z-planes but 128 x-columns), and 3·B·kp is the
    # global pair sort's input size; the engine auto-tightens this per axis
    # from the measured p100 (`pair_nz`)
    max_pairs_per_block: object = 128
    max_pairs: int = 0
    # live-entry cap for the pre-sort compaction (0 = off): the raw
    # 3·B·kp entry stream is ~85-90% sentinel padding once kp is
    # tightened; compacting live entries first shrinks the global pair
    # sort (the dominant post-kernel stage) to entry_cap rows. The engine
    # converges this from the measured live count (`n_live`), with the
    # same rerun-larger retry as every other buffer bound.
    entry_cap: int = 0
    # live-row cap for the moment-combine compaction (0 = off): only the
    # occupied (block, slot) rows feed the segment combine — same
    # converge-from-measurement scheme as entry_cap.
    row_cap: int = 0
    # kernel-v2 block packing: P consecutive blocks share ONE grid step
    # (one dictionary-extraction chain, one packed marginal dot) — the
    # chain's serial latency and the per-step fixed costs divide by P.
    # Outputs are bit-identical at any P (parity-tested at P=1/2/4);
    # hardware default pending the on-silicon A/B (see _dict_extract).
    pack: int = 1
    # two-phase dictionary extraction (kernel-v2 only): 0 = off (direct
    # serial chain); > 0 = phase-1 per-x-row rounds (`_dict_extract_rows`;
    # each row holds ≤ 2·dict_rows distinct labels or the dict-overflow
    # retry doubles it). Default off pending the on-silicon A/B.
    dict_rows: int = 0
    seam_tile: Tuple[int, int] = (64, 256)  # bigger tiles ⇒ fewer top_k rows
    seam_max_labels: int = 64  # seam tiles span more cells than blocks
    max_pairs_per_seam_tile: int = 256

    def derived_max_pairs(self, n_labels: int) -> int:
        if self.max_pairs:
            return self.max_pairs
        return max(2048, 24 * n_labels)


def _check_static_pallas(shape, n_labels, cfg: PallasConfig) -> bool:
    """Validate exactness preconditions; returns ``wide``.

    ``wide=False``: the compact 5-piece reconstruction contract (34 moment
    columns) is exact — requires oᵢ·s1ⱼ ≤ 2³¹ and K·(q>>Q) ≤ 2³¹, which
    caps extents near 1024 voxels per axis. That path is kept as-is for
    the common case: its combined table is 2/3 the readback bytes.

    ``wide=True``: the 8-piece contract (52 columns) — offsets 9-bit-split
    at _QSHIFT so every split column stays < 2³⁰, its (lo, hi) parts at
    2^_SPLIT are < 2^15, and the global segment sum over ≤ 2^16 rows (one
    row per block a label appears in — hence the B ≤ 2^16 bound) stays
    int32-exact. Piece magnitudes (see `_moment_pieces`):
      - q = oᵢ·oⱼ is computed in int32 → off_max[i]·off_max[j] ≤ 2³¹−1
      - (oᵢ>>Q)·s1ⱼ < 2³⁰ and (oᵢ&qmask)·s1ⱼ ≤ 511·K·(b−1) < 2³⁰
      - global Σc = s1 + C·o < 2³⁰ → K·off_max + s1_max < 2³⁰
      - C·q_lo/q_mid ≤ K·511 < 2³⁰; C·(q>>2Q) < 2³⁰ given q ≤ 2³¹
    This admits ~46k-voxel extents per axis (e.g. the 4096² 2D lift and
    2048³ slabs) within the B ≤ 2^16 block budget.

    Raises when even the wide bounds fail.
    """
    bz, by, bx = cfg.block
    K = bz * by * bx
    n = n_labels
    if n * 4 + 3 > int(_IMAX):
        raise ValueError(
            "n_labels exceeds the int32 (hi·4 + axis) sort-key space "
            "(n must be < 2^29)"
        )
    grid = _grid(shape, cfg.block)
    padded = tuple(g * b for g, b in zip(grid, cfg.block))
    off_max = [p - b for p, b in zip(padded, cfg.block)]
    s1_max = [K * (b - 1) for b in cfg.block]
    qmask = (1 << _QSHIFT) - 1
    lim30 = 1 << 30

    narrow_bad = K * qmask > int(_IMAX)
    for i in range(3):
        for j in range(3):
            narrow_bad |= off_max[i] * s1_max[j] > int(_IMAX)
            narrow_bad |= (
                K * ((off_max[i] * off_max[j]) >> _QSHIFT) > int(_IMAX)
            )
    if not narrow_bad:
        return False

    # rows-per-label segment ≤ number of blocks
    wide_bad = grid[0] * grid[1] * grid[2] > (1 << 16)
    wide_bad |= K * qmask >= lim30  # C·q_lo / C·q_mid pieces
    for i in range(3):
        wide_bad |= K * off_max[i] + s1_max[i] >= lim30  # global Σc column
        for j in range(3):
            wide_bad |= off_max[i] * off_max[j] > int(_IMAX)  # q in int32
            wide_bad |= (off_max[i] >> _QSHIFT) * s1_max[j] >= lim30
            wide_bad |= qmask * s1_max[j] >= lim30  # lo piece (static)
            # C·(q>>2Q): guarded with q already known to fit int32
            if off_max[i] * off_max[j] <= int(_IMAX):
                wide_bad |= (
                    K * ((off_max[i] * off_max[j]) >> (2 * _QSHIFT)) >= lim30
                )
    if wide_bad:
        raise ValueError(
            "stack too large for the Pallas engine's int32 reconstruction; "
            "use the blocked engine"
        )
    return True


def _weight_table(block) -> np.ndarray:
    """Static TRANSPOSED [Wp, K] bf16 weight/selector table
    (Wp = 2·_N_FEATS + bz + by + bx padded up to a multiple of 16).

    First 2·_N_FEATS rows: lo/hi-split local-coordinate moment weights
    (parts < 2^_WSHIFT). Next rows: coordinate-plane presence selectors
    (0/1) for the bbox supports. Stored [W, K] (contraction dim LAST, like
    the neighbor one-hots) so the kernel concatenates it with them and
    consumes everything in ONE MXU dot; pad rows are zero.
    """
    bz, by, bx = block
    z, y, x = np.meshgrid(
        np.arange(bz), np.arange(by), np.arange(bx), indexing="ij"
    )
    z = z.reshape(-1).astype(np.int64)
    y = y.reshape(-1).astype(np.int64)
    x = x.reshape(-1).astype(np.int64)
    one = np.ones_like(z)
    feats = [one, z, z * z, y, y * y, z * y, x, x * x, z * x, y * x]
    cols = []
    for f in feats:
        cols.append(f & _WMASK)
        cols.append(f >> _WSHIFT)
    for coord, extent in ((z, bz), (y, by), (x, bx)):
        for c in range(extent):
            cols.append((coord == c).astype(np.int64))
    w = np.stack(cols, axis=0)  # [W, K]
    assert w.max() < (1 << _WSHIFT)
    wp = -(-w.shape[0] // 16) * 16
    out = np.zeros((wp, w.shape[1]), dtype=np.int64)
    out[: w.shape[0]] = w
    return out.astype(jnp.bfloat16)


def _packed_layout(L):
    """Column layout of the kernel's single packed output [L, OUTW].

    One WIDE aligned output instead of seven narrow ones: narrow per-step
    DMAs ([L,1]/[L,20]/[L,3] blocks) cost ~80 ms of padded partial-tile
    writes at 512³; a single lane-aligned [L, OUTW] tile is free.
    Columns: ids 1 | moments 2F | bbmin 3 | bbmax 3 | pz L | py L | px L |
    ovf 1, padded to a 128-lane multiple.
    """
    F2 = 2 * _N_FEATS
    cols = {}
    c = 0
    for name, width in (
        ("ids", 1), ("mom", F2), ("bbmin", 3), ("bbmax", 3),
        ("pz", L), ("py", L), ("px", L), ("ovf", 1),
    ):
        cols[name] = (c, c + width)
        c += width
    outw = -(-c // 128) * 128
    return cols, outw


def _n_mom_cols(wide: bool) -> int:
    """count, gΣc (3), 6 second moments × (8 wide / 5 narrow) pieces."""
    return 4 + 6 * (8 if wide else 5)


def _moment_pieces(C, s1, s2, o, wide: bool):
    """Global-coordinate split moment piece list — the ONE definition of
    the reconstruction contract, shared verbatim by kernel-v2 (in-VMEM,
    [L, 1] column operands) and the v1 XLA path (`_reconstruct_rows`,
    [B, L] operands with [B, 1] offsets).

    ``s1``/``s2``: local Σc per axis / Σcᵢcⱼ per tri-pair; ``o``: global
    block origins. Narrow (5-piece) order per second moment (i, j):
    [S2_loc, oᵢ·s1ⱼ, oⱼ·s1ᵢ, C·q_lo, C·q_hi] with q = oᵢ·oⱼ, assembled as
    p₀+p₁+p₂+p₃+(p₄<<Q). Wide (8-piece): offsets 9-bit-split so every
    piece stays < 2³⁰ up to ~46k-voxel extents (`_check_static_pallas`):
    [S2_loc, (oᵢ&m)·s1ⱼ, (oᵢ>>Q)·s1ⱼ, (oⱼ&m)·s1ᵢ, (oⱼ>>Q)·s1ᵢ, C·q_lo,
    C·q_mid, C·q_hi], assembled as p₀+p₁+(p₂<<Q)+p₃+(p₄<<Q)+p₅+(p₆<<Q)
    +(p₇<<2Q).
    """
    qmask = (1 << _QSHIFT) - 1
    cols = [C]
    for d in range(3):
        cols.append(s1[d] + C * o[d])  # global Σc_d
    # tri_pairs(3) order: zz, zy, zx, yy, yx, xx
    for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        q = o[i] * o[j]
        if wide:
            cols.extend([
                s2[(i, j)],
                (o[i] & qmask) * s1[j],
                (o[i] >> _QSHIFT) * s1[j],
                (o[j] & qmask) * s1[i],
                (o[j] >> _QSHIFT) * s1[i],
                C * (q & qmask),
                C * ((q >> _QSHIFT) & qmask),
                C * (q >> (2 * _QSHIFT)),
            ])
        else:
            cols.extend([
                s2[(i, j)],
                o[i] * s1[j],
                o[j] * s1[i],
                C * (q & qmask),
                C * (q >> _QSHIFT),
            ])
    return cols


def _packed_layout_v2(L, wide: bool = False):
    """Column layout of kernel-v2's packed output [L, OUTW].

    v2 reconstructs the global-coordinate split moment columns IN-KERNEL
    (the XLA `_reconstruct_rows` + `_split_rows` stage measured ~21 ms at
    512³ — narrow [B, L, 20→68] elementwise passes XLA schedules poorly;
    in VMEM the same math is ~1 ms and the mom/bb slices disappear).
    Columns: ids 1 | split global moment cols (68 narrow / 104 wide — see
    `_moment_pieces`) | gmin 3 | gmax 3 | pz L | py L | px L | ovf 1,
    padded to a 128-lane multiple (at the default L = 32 both contracts
    pad to OUTW 256 — the wide contract is DMA-free; only the combined
    [n, ·] readback grows).
    """
    cols = {}
    c = 0
    for name, width in (
        ("ids", 1), ("cols", 2 * _n_mom_cols(wide)), ("gmin", 3),
        ("gmax", 3), ("pz", L), ("py", L), ("px", L), ("ovf", 1),
    ):
        cols[name] = (c, c + width)
        c += width
    outw = -(-c // 128) * 128
    return cols, outw


def _kernel_factory(block, L, n):
    bz, by, bx = block
    K = bz * by * bx
    cols, outw = _packed_layout(L)
    F2 = 2 * _N_FEATS

    def kernel(v8_ref, vrz_ref, vry_ref, vrx_ref, ex_ref, w_ref, out_ref):
        # Everything is 2D — no layout-changing reshapes in-kernel (Mosaic
        # rejects shape casts that cross the lane boundary). All inputs come
        # in the [8, K/8] full-sublane layout ([1, K] runs the VPU at 1/8
        # occupancy). The three neighbor arrays are GLOBAL +1-voxel shifts
        # with label-n fill (not in-block rolls), so the pair dots count
        # cross-block faces too and no separate seam pass exists; pairs
        # whose neighbor label is outside the dictionary (only the fill /
        # pad label n, see extras below) simply hit a zero one-hot column,
        # which is exactly the drop the compaction's hi < n filter would do.
        # Inputs may arrive as uint16 (halves HBM for big stacks).
        v8 = v8_ref[0].astype(jnp.int32)  # [8, K/8]

        # ---- 1. dictionary: iterative masked min/max extraction over the
        # block PLUS the compact ``extras`` rows (the neighbor arrays'
        # boundary planes, pre-packed in XLA — a neighbor label absent from
        # the block itself can only live there, and it must be in the
        # dictionary or its face pair would silently vanish from the
        # one-hot dot). Labels >= n (fill/pad) arrive pre-masked to IMAX
        # and never take a slot. When ≤1 label remains in a group, max ==
        # min (or the group is empty: min = IMAX, max = -1) and the max
        # slot stays IMAX via the x > m guard — no duplicate dictionary
        # entries, which would double-count in the one-hot dots. Slot ORDER
        # is not ascending, which is fine: every consumer (one-hot compare,
        # pair compaction, global segment-combine, final pair sort) is
        # slot-order agnostic, so the output tables stay bit-identical.
        # ids built [L, 1] by sublane-iota select; hashed G-group
        # partitioned extraction (chain = L/(2G) steps, see _dict_extract).
        v_all = jnp.concatenate([v8, ex_ref[0]], axis=0)  # [8 + E8, K/8]
        ids, ovf = _dict_extract(v_all, L, n)

        def onehot(u8):
            # [8, K/8] labels -> [L, K] bf16 one-hot at FULL sublane
            # occupancy: compare one sublane row at a time ([1, K/8] vs
            # [L, 1] -> [L, K/8]) and concatenate along lanes — row s holds
            # flat K-indices [s·K/8, (s+1)·K/8), so the concat reproduces
            # flat K order exactly.
            parts = [
                (u8[s:s + 1, :] == ids).astype(jnp.bfloat16) for s in range(8)
            ]
            return jnp.concatenate(parts, axis=1)  # [L, K]

        # ---- 2. one-hot [L, K] bf16 ---------------------------------------
        oh = onehot(v8)

        # ---- 3+4. moments + bbox supports + pair counts: ONE MXU dot ------
        # RHS = [weights/selectors ; three neighbor one-hots], all with the
        # contraction (K) dim last — a single [L, K]×[Wp+3L, K]ᵀ issue
        # instead of four quarter-empty ones. momf columns are exact
        # integers in f32 (weight parts < 2^7, sums < 2^24); the trailing
        # [L, 3L] block IS the packed pz|py|px layout verbatim.
        wp = w_ref.shape[0]
        nb = jnp.concatenate(
            [onehot(vrz_ref[0].astype(jnp.int32)),
             onehot(vry_ref[0].astype(jnp.int32)),
             onehot(vrx_ref[0].astype(jnp.int32))], axis=0
        )  # [3L, K]
        rhs = jnp.concatenate([w_ref[:, :], nb], axis=0)  # [Wp + 3L, K]
        allf = jax.lax.dot_general(
            oh, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, Wp + 3L]
        momi = allf[:, :F2].astype(jnp.int32)

        mins, maxs = [], []
        col = F2
        for extent in (bz, by, bx):
            supp = allf[:, col:col + extent]  # [L, extent] voxel counts
            col += extent
            present = supp > 0
            ii = jax.lax.broadcasted_iota(jnp.int32, (L, extent), 1)
            mins.append(jnp.min(jnp.where(present, ii, _IMAX), axis=1))
            maxs.append(jnp.max(jnp.where(present, ii, -1), axis=1))
        bbmin = jnp.stack(mins, axis=1)
        bbmax = jnp.stack(maxs, axis=1)

        pf = allf[:, wp:].astype(jnp.int32)  # [L, 3L] = pz | py | px
        # zero the same-label diagonals: interior faces (label touching
        # itself across the +1 shift) are by far the largest entries and
        # are dropped downstream anyway (lo != hi filter) — zeroing them
        # here keeps them out of the top_k compaction's kp budget, the
        # count·L² packing headroom, and the measured pair_nz statistic
        ii = jax.lax.broadcasted_iota(jnp.int32, (L, 3 * L), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (L, 3 * L), 1)
        pf = jnp.where(jj % L == ii, 0, pf)

        pieces = [ids, momi, bbmin, bbmax, pf, ovf]
        used = 8 + F2 + 3 * L
        if outw > used:
            pieces.append(jnp.zeros((L, outw - used), jnp.int32))
        out_ref[0] = jnp.concatenate(pieces, axis=1)

    return kernel


def _v2_eligible(block, n) -> bool:
    """kernel-v2 layout preconditions (see `_kernel_factory_v2`).

    n < 2¹⁶ (the uint16 domain): the x-patch spread splits label values
    into two 8-bit parts so they survive Mosaic's bf16 MXU demotion
    exactly. Larger label spaces take the v1 path."""
    return tuple(block) == (8, 16, 128) and n < (1 << 16)


def _weight_table_v2(block):
    """Static tables for kernel-v2's marginal formulation.

    Returns (wv2 [WP, K8] bf16, xsel [by, K8] f32):

    - ``wv2`` rows (consumed by ONE [3L, K8]×[WP, K8]ᵀ dot against the
      stacked marginals): 8 moment weight rows over lane j = y·bx + x —
      [1, y, y², x, x²_lo, x²_hi, yx_lo, yx_hi] — then by y-plane selectors
      and bx x-column selectors for the bbox supports; padded to a sublane
      multiple. Every weight is an integer ≤ 256 (bf16-exact); used
      products sum < 2²⁴ so the f32 MXU accumulation is exact.
    - ``xsel`` spreads the per-(z, y) x-boundary patch values to lanes
      j ≡ bx-1 (mod bx): xsel[t, j] = (j == t·bx + bx-1).
    """
    bz, by, bx = block
    k8 = by * bx
    j = np.arange(k8)
    y = j // bx
    x = j % bx
    x2 = x * x
    yx = y * x
    rows = [
        np.ones(k8, np.int64), y, y * y, x,
        x2 & _WMASK, x2 >> _WSHIFT, yx & _WMASK, yx >> _WSHIFT,
    ]
    for c in range(by):
        rows.append((y == c).astype(np.int64))
    for c in range(bx):
        rows.append((x == c).astype(np.int64))
    w = np.stack(rows, axis=0)
    assert w.max() <= 256
    wp = -(-w.shape[0] // 16) * 16
    out = np.zeros((wp, k8), dtype=np.int64)
    out[: w.shape[0]] = w
    # x-patch spread: xv rows are 128-lane groups whose first `by` lanes
    # hold the next-x plane values for y = 0..by-1 (128-aligned so the
    # kernel's sublane-concat of the slices has uniform lane offsets);
    # xsel[t, j] routes lane t to every lane j with j//bx == t (t < by)
    xsel = ((j[None, :] // bx) == np.arange(128)[:, None]).astype(np.float32)
    return out.astype(jnp.bfloat16), xsel


def _kernel_factory_v2(block, L, n, P=1, wide=False, dict_rows=0):
    """Fused kernel, v2: single stack input + compact extras.

    Layout preconditions (`_v2_eligible`): block == (8, 16, 128), so the
    [8, K/8] sublane rows ARE the z-planes and lane j = y·128 + x — which
    makes the three +1-voxel neighbor arrays constructible IN-KERNEL
    (sublane shift / lane roll + boundary patches from the 2-row extras)
    instead of shipping three full shifted copies of the stack through HBM,
    and lets the moment/bbox weights ride narrow [·, K/8] dots against
    z-weighted marginals instead of the K-wide one-hot dot (the big MXU dot
    shrinks to the three face blocks, 272 → 96 RHS rows). n < 2¹⁶ keeps
    the 8-bit-split x-patch spread matvec exact under Mosaic's bf16 MXU
    demotion. Unlike v1, v2 also reconstructs the GLOBAL split moment
    columns and bbox in-kernel from scalar-prefetched block offsets (see
    `_packed_layout_v2`); the dictionary and pair contract match v1 and
    outputs stay bit-identical to every other engine.

    ``P`` packs P consecutive blocks into ONE grid step (inputs arrive
    sublane-stacked: v8 [P·8, K8], extras [P·2, K8], output [P·L, outw]
    with block p in rows p·L..(p+1)·L-1). Every per-block computation is
    UNCHANGED — outputs are bit-identical to P=1 — but the serial
    dictionary-extraction chain (the kernel's dominant latency, ~22 ms of
    the ~52 ms grid at 512³) runs ONCE per step serving all P blocks
    (`_dict_extract`'s packed bands), the marginal moment dot packs P
    blocks along M (3·P·L rows against the shared weight table), and the
    per-step fixed costs (DMA issue, grid bookkeeping) amortize P×.
    """
    bz, by, bx = block
    K = bz * by * bx
    K8 = K // 8
    cols, outw = _packed_layout_v2(L, wide)

    def kernel(offs_ref, v8_ref, ex_ref, wv2_ref, xsel_ref, out_ref):
        # offs_ref: flat [3B] scalar-prefetch (SMEM) — global (z, y, x)
        # block origins, already including any traced slab z-offset
        g = pl.program_id(0)
        v8s = [
            v8_ref[0, 8 * p:8 * (p + 1)].astype(jnp.int32) for p in range(P)
        ]  # per block [8, K8] — rows are z-planes
        exa = ex_ref[0].astype(jnp.int32)  # [2P, K8] raw labels, n-filled:
        # per block, row 0 = next-z plane [by·bx]; row 1 = next-y plane
        # [bz·bx = 1024] then next-x plane [bz·by = 128] then n-padding

        # ---- 1. dictionary (identical to v1): extras rows ride along so
        # out-of-block neighbor labels get slots; fill/pad labels are >= n
        # and the `< n` mask excludes them. All P blocks extract in ONE
        # shared serial chain (see `_dict_extract`): ids_all [P·L, 1],
        # block p in rows p·L..(p+1)·L-1.
        v_all = jnp.concatenate(
            [r for p in range(P) for r in (v8s[p], exa[2 * p:2 * (p + 1)])],
            axis=0,
        )  # [P·10, K8]
        if dict_rows:
            ids_all, ovf_all = _dict_extract_rows(v_all, L, n, dict_rows, P)
        else:
            ids_all, ovf_all = _dict_extract(v_all, L, n, P)

        def onehot_rows(u, ids):
            # [R, K8] labels -> list of R [L, K8] bf16 one-hot parts
            return [
                (u[s:s + 1, :] == ids).astype(jnp.bfloat16)
                for s in range(u.shape[0])
            ]

        # ---- 2+3 (dots). one-hot parts per block (kept per z-plane) and
        # z-weighted marginals, all P blocks packed along M into ONE
        # [3·P·L, K8]×[WP, K8]ᵀ dot against the shared weight table.
        # myx ≤ 8, mz1 ≤ Σs = 28, mz2 ≤ Σs² = 140 — all < 256, bf16-exact.
        parts_all = []
        m3_list = []
        for p in range(P):
            parts = onehot_rows(v8s[p], ids_all[L * p:L * (p + 1)])
            myx = parts[0]
            mz1 = jnp.zeros_like(parts[0])
            mz2 = jnp.zeros_like(parts[0])
            for s in range(1, 8):
                myx = myx + parts[s]
                mz1 = mz1 + jnp.bfloat16(s) * parts[s]
                mz2 = mz2 + jnp.bfloat16(s * s) * parts[s]
            parts_all.append(parts)
            m3_list.extend([myx, mz1, mz2])
        m3 = jnp.concatenate(m3_list, axis=0)  # [3·P·L, K8]
        mball = jax.lax.dot_general(
            m3, wv2_ref[:, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3·P·L, WP]: block p's myx/mz1/mz2 rows start at 3L·p

        def col(t, c):
            return t[:, c:c + 1]

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, K8), 1)
        ncols = 2 * _n_mom_cols(wide)
        lanec = jax.lax.broadcasted_iota(jnp.int32, (L, ncols), 1)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (L, 3), 1)
        smask = (1 << _SPLIT) - 1

        outs = []
        for p in range(P):
            v8 = v8s[p]
            exz = exa[2 * p:2 * p + 1]      # next-z plane row
            exy = exa[2 * p + 1:2 * p + 2]  # next-y | next-x | pad row
            parts = parts_all[p]
            ids = ids_all[L * p:L * (p + 1)]
            oh = jnp.concatenate(parts, axis=1)  # [L, K] flat K order
            mb = mball[3 * L * p:3 * L * (p + 1)]
            byx = mb[:L].astype(jnp.int32)
            bz1 = mb[L:2 * L].astype(jnp.int32)
            bz2 = mb[2 * L:3 * L].astype(jnp.int32)

            count = col(byx, 0)
            sy, syy = col(byx, 1), col(byx, 2)
            sx = col(byx, 3)
            sxx = col(byx, 4) + (col(byx, 5) << _WSHIFT)
            syx = col(byx, 6) + (col(byx, 7) << _WSHIFT)
            sz, szy, szx = col(bz1, 0), col(bz1, 1), col(bz1, 3)
            szz = col(bz2, 0)

            # ---- 3b. local → GLOBAL split moment columns, in-kernel ----
            # `_moment_pieces` (the shared contract — see its docstring for
            # the int32-exactness bounds per width), each piece hi/lo-split
            # at 2^_SPLIT and interleaved — the same [·, 68/104] layout
            # every combine/assemble consumer reads. All elementwise int32
            # VPU math on [L, 1] columns (no MXU, no bf16 demotion risk);
            # XLA ran this over [B, L, 20→68] arrays at ~21 ms per 512³
            # pass, in VMEM it fuses into the kernel.
            b = g * P + p
            o = [offs_ref[3 * b], offs_ref[3 * b + 1], offs_ref[3 * b + 2]]
            s1g = {0: sz, 1: sy, 2: sx}
            s2g = {(0, 0): szz, (0, 1): szy, (0, 2): szx,
                   (1, 1): syy, (1, 2): syx, (2, 2): sxx}
            cpieces = _moment_pieces(count, s1g, s2g, o, wide)
            colsg = jnp.zeros((L, ncols), jnp.int32)
            for c, vec in enumerate(cpieces):
                colsg = jnp.where(
                    lanec == 2 * c,
                    jnp.broadcast_to(vec & smask, (L, ncols)), colsg
                )
                colsg = jnp.where(
                    lanec == 2 * c + 1,
                    jnp.broadcast_to(vec >> _SPLIT, (L, ncols)), colsg
                )

            zsup = jnp.concatenate(
                [jnp.sum(q.astype(jnp.float32), axis=1, keepdims=True)
                 for q in parts],
                axis=1,
            )  # [L, bz]
            ysup = mb[:L, 8:8 + by]
            xsup = mb[:L, 8 + by:8 + by + bx]
            mins, maxs = [], []
            for supp, extent in ((zsup, bz), (ysup, by), (xsup, bx)):
                present = supp > 0
                ii = jax.lax.broadcasted_iota(jnp.int32, (L, extent), 1)
                mins.append(jnp.min(jnp.where(present, ii, _IMAX), axis=1))
                maxs.append(jnp.max(jnp.where(present, ii, -1), axis=1))
            bbmin = jnp.stack(mins, axis=1)
            bbmax = jnp.stack(maxs, axis=1)
            # global bbox (same sentinel rules as `_reconstruct_rows`)
            offv = jnp.where(
                lane3 == 0, o[0], jnp.where(lane3 == 1, o[1], o[2])
            )
            gmin = jnp.where(bbmin < _IMAX, bbmin + offv, _IMAX)
            gmax = jnp.where(bbmax >= 0, bbmax + offv, -1)

            # ---- 4. neighbor one-hots built from the BLOCK'S OWN one-hot
            # parts (one-hot commutes with the +1-voxel shifts) — only the
            # boundary patches need fresh compares, so the z and y neighbor
            # one-hots cost 1 full-width + 8 narrow compares instead of 16
            # full-width ones (~40% of the kernel's compare traffic).
            # z: rows 0..6 ARE parts[1..7]; row 7 is the extras next-z plane
            ohz_extra = (exz == ids).astype(jnp.bfloat16)  # [L, K8]
            # y: +1 y = +bx lanes. The offset-bx slice is vreg-lane-aligned
            # (bx == 128), unlike the offset-1 slice that silently
            # mis-lowers (see vrx below) — covered by test_pallas_engine's
            # bit-parity and the on-silicon 512³ cross-engine check.
            ypatch = jnp.concatenate(
                [exy[:, s * bx:(s + 1) * bx] for s in range(8)], axis=0
            )  # [8, bx]
            ypatch_oh = [
                (ypatch[s:s + 1, :] == ids).astype(jnp.bfloat16)
                for s in range(8)
            ]  # [L, bx] each
            # x: +1 lane; x == bx-1 lanes patch from the next-x plane
            # (extras row 1, one 128-aligned lane group per z-plane whose
            # first `by` lanes are the values), spread to lanes
            # j ≡ bx-1 (mod bx) by one-hot matvecs. The values are split
            # into two 8-bit parts FIRST: Mosaic lowers f32×f32 MXU dots
            # as single-pass bf16, so whole label values > 256 would round
            # (observed at 512³/2031 labels: sparse wrong x-neighbors +
            # phantom pairs); parts ≤ 255 are bf16-exact, and each output
            # lane sums exactly one product.
            xv = jnp.concatenate(
                [exy[:, bz * bx + s * 128: bz * bx + (s + 1) * 128]
                 for s in range(8)],
                axis=0,
            )  # [8, 128]

            def spread(vals):
                return jax.lax.dot_general(
                    vals.astype(jnp.float32), xsel_ref[:, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)

            xspread = spread(xv & 255) + (spread(xv >> 8) << 8)  # [8, K8]
            # +1-lane shift via circular roll (shift K8-1 ⇒ out[j] =
            # in[j+1]) — a lane-concat of the offset-1 slice ([:, 1:])
            # compiles but SILENTLY mis-lowers on Mosaic (x-face counts
            # came back wrong at 512³); the wrapped lane K8-1 has
            # x == bx-1 and is overwritten by the patch anyway
            xshift = pltpu.roll(v8, K8 - 1, 1)
            vrx = jnp.where(lane % bx == bx - 1, xspread, xshift)

            ohz = jnp.concatenate(parts[1:] + [ohz_extra], axis=1)  # [L, K]
            ohy = jnp.concatenate(
                [jnp.concatenate([parts[s][:, bx:], ypatch_oh[s]], axis=1)
                 for s in range(8)],
                axis=1,
            )  # [L, K]
            ohx = jnp.concatenate(onehot_rows(vrx, ids), axis=1)  # [L, K]
            nb = jnp.concatenate([ohz, ohy, ohx], axis=0)  # [3L, K]
            pf = jax.lax.dot_general(
                oh, nb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # [L, 3L] = pz | py | px
            ii = jax.lax.broadcasted_iota(jnp.int32, (L, 3 * L), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (L, 3 * L), 1)
            pf = jnp.where(jj % L == ii, 0, pf)

            pieces = [
                ids, colsg, gmin, gmax, pf, ovf_all[L * p:L * (p + 1)]
            ]
            used = 1 + ncols + 3 + 3 + 3 * L + 1
            if outw > used:
                pieces.append(jnp.zeros((L, outw - used), jnp.int32))
            outs.append(jnp.concatenate(pieces, axis=1))
        out_ref[0] = jnp.concatenate(outs, axis=0)

    return kernel


def _extras_v2(dense, n, block):
    """[B, 2, K8] extras for kernel-v2: per block, the +1 boundary plane of
    every axis, raw labels with fill n beyond the (padded) stack.

    Row 0 = the next-z plane ([by·bx] lanes); row 1 = the next-y plane
    ([bz, bx] z-major), then the next-x plane ([bz, by] z-major), then
    n-padding. ``dense`` must already be block-padded.
    """
    bz, by, bx = block
    Z, Y, X = dense.shape
    gz, gy, gx = Z // bz, Y // by, X // bx
    B = gz * gy * gx
    K8 = bz * by * bx // 8
    fill = jnp.full((), n, dense.dtype)

    zp = jnp.concatenate(
        [dense[bz::bz], jnp.broadcast_to(fill, (1, Y, X))], axis=0
    )  # [gz, Y, X] — plane below each z-block row
    zp = (
        zp.reshape(gz, gy, by, gx, bx)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, by * bx)
    )
    yp = jnp.concatenate(
        [dense[:, by::by], jnp.broadcast_to(fill, (Z, 1, X))], axis=1
    )  # [Z, gy, X]
    yp = (
        yp.reshape(gz, bz, gy, gx, bx)
        .transpose(0, 2, 3, 1, 4)
        .reshape(B, bz * bx)
    )
    xp = jnp.concatenate(
        [dense[:, :, bx::bx], jnp.broadcast_to(fill, (Z, Y, 1))], axis=2
    )  # [Z, Y, gx]
    xp = (
        xp.reshape(gz, bz, gy, by, gx)
        .transpose(0, 2, 4, 1, 3)
        .reshape(B, bz, by)
    )
    # pad each z-row to a 128-lane group (the kernel sublane-concatenates
    # 128-aligned slices; Mosaic rejects unaligned lane offsets)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 128 - by)), constant_values=n)
    xp = xp.reshape(B, bz * 128)
    ex = jnp.concatenate([zp, yp, xp], axis=1)
    pad = 2 * K8 - ex.shape[1]
    ex = jnp.pad(ex, ((0, 0), (0, pad)), constant_values=n)
    return ex.reshape(B, 2, K8)


def _pallas_group_v2(vb, ex, offs, wv2, xsel, block, L, n, interpret,
                     P=1, wide=False, dict_rows=0):
    """One v2 pallas_call over a group of blocks.

    ``offs``: [B, 3] int32 global block origins (any traced slab z-offset
    already added) — scalar-prefetched to SMEM for the in-kernel moment
    reconstruction. Returns GLOBAL split cols/bbox (no XLA reconstruction
    stage): (ids, cols, gmin, gmax, pz, py, px, dict_ovf).

    ``P`` > 1 packs P consecutive blocks per grid step (see
    `_kernel_factory_v2`); the group is padded to a P multiple with
    label-n blocks (empty dictionaries, zero contributions — the same
    contract as grid-padding blocks) and the packed output unpacks back to
    per-block rows, so results are bit-identical to P=1.
    """
    B = vb.shape[0]
    bz, by, bx = block
    K = bz * by * bx
    K8 = K // 8
    Bp = -(-B // P) * P
    if Bp != B:
        vb = jnp.concatenate(
            [vb, jnp.full((Bp - B,) + vb.shape[1:], n, vb.dtype)]
        )
        ex = jnp.concatenate(
            [ex, jnp.full((Bp - B,) + ex.shape[1:], n, ex.dtype)]
        )
        offs = jnp.concatenate(
            [offs, jnp.zeros((Bp - B, 3), offs.dtype)]
        )
    kernel = _kernel_factory_v2(block, L, n, P, wide, dict_rows)
    cols, outw = _packed_layout_v2(L, wide)
    mat = lambda i, offs_ref: (i, 0, 0)  # noqa: E731
    brd = lambda i, offs_ref: (0, 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // P,),
        in_specs=[
            pl.BlockSpec((1, 8 * P, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * P, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec(wv2.shape, brd, memory_space=pltpu.VMEM),
            pl.BlockSpec(xsel.shape, brd, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, L * P, outw), mat, memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((Bp // P, L * P, outw), jnp.int32),
        interpret=interpret,
    )(
        offs.reshape(-1),
        vb.reshape(Bp // P, 8 * P, K8),
        ex.reshape(Bp // P, 2 * P, K8),
        wv2,
        xsel,
    )
    out = out.reshape(Bp, L, outw)
    if Bp != B:
        out = out[:B]

    def sl(name):
        a, b = cols[name]
        return out[:, :, a:b]

    return (
        sl("ids")[:, :, 0], sl("cols"), sl("gmin"), sl("gmax"),
        sl("pz"), sl("py"), sl("px"), sl("ovf")[:, 0, 0] > 0,
    )


def _shift_fill(dense, axis, fill):
    """Global +1-voxel shift along ``axis`` with ``fill`` at the far face.

    The true next-voxel neighbor everywhere — including across block
    boundaries — so the kernel's pair dots need no face masks and no
    separate seam pass; boundary faces pair with ``fill`` (= the dropped
    label n) and are filtered by the compaction's hi < n check.
    """
    moved = jax.lax.slice_in_dim(dense, 1, dense.shape[axis], axis=axis)
    pad_shape = list(dense.shape)
    pad_shape[axis] = 1
    pad = jnp.full(pad_shape, fill, dense.dtype)
    return jnp.concatenate([moved, pad], axis=axis)


def _block_offsets_np(shape, block):
    """[B, 3] int32 global (z, y, x) origins of every block of ``shape``
    (block-padded), in the flat z-major block order of `_blockify`."""
    gz, gy, gx = _grid(shape, block)
    bz, by, bx = block
    ozz, oyy, oxx = np.meshgrid(
        np.arange(gz) * bz, np.arange(gy) * by, np.arange(gx) * bx,
        indexing="ij",
    )
    return np.stack(
        [ozz.reshape(-1), oyy.reshape(-1), oxx.reshape(-1)], axis=1
    ).astype(np.int32)


def _pallas_main_pass(dense, block, L, n, interpret, offs=None,
                      group_blocks=8192, pack=1, wide=False, dict_rows=0):
    """dense: block-padded [Z, Y, X] stack (uint16 or int32).

    Dispatches to kernel-v2 (default block — single stack input, in-kernel
    neighbor construction, marginal moment dots AND in-kernel global
    moment/bbox reconstruction; see `_kernel_factory_v2`) or the v1 path
    (any block shape: blockifies three globally-shifted neighbor copies
    alongside the stack; local moments, reconstructed by the caller in
    XLA). Both run the kernel grid in `lax.map` groups so the per-group
    working set stays bounded at Gvoxel scale. Padding blocks carry the
    label n (the dropped segment).

    ``offs``: [B, 3] int32 global block origins, REQUIRED on the v2 path
    (use `_v2_eligible` to know which return contract applies): v2 returns
    (ids, cols, gmin, gmax, pz, py, px, dovf) already global/split,
    v1 returns (ids, mom_local, bbmin, bbmax, pz, py, px, dovf) local."""
    bz, by, bx = block
    K = bz * by * bx
    K8 = K // 8
    if _v2_eligible(block, n):
        if offs is None:
            raise ValueError("offs is required on the kernel-v2 path")
        vb = _blockify(dense, block).reshape(-1, 8, K8)
        ex = _extras_v2(dense, n, block)
        wv2_np, xsel_np = _weight_table_v2(block)
        wv2 = jnp.asarray(wv2_np)
        xsel = jnp.asarray(xsel_np)
        offs = jnp.asarray(offs, jnp.int32)
        B_total = vb.shape[0]
        group = min(group_blocks, B_total)
        if B_total <= group:
            return _pallas_group_v2(
                vb, ex, offs, wv2, xsel, block, L, n, interpret, pack,
                wide, dict_rows
            )
        vb_g = _group_pad(vb, group, n)
        ex_g = _group_pad(ex, group, n)
        offs_g = _group_pad(offs, group, 0)

        def run_group_v2(args):
            return _pallas_group_v2(
                *args, wv2, xsel, block, L, n, interpret, pack, wide,
                dict_rows
            )

        outs = jax.lax.map(run_group_v2, (vb_g, ex_g, offs_g))
        flat = [o.reshape((-1,) + o.shape[2:])[:B_total] for o in outs]
        return tuple(flat)

    w = jnp.asarray(_weight_table(block))
    vb = _blockify(dense, block)
    nbrs = [
        _blockify(_shift_fill(dense, ax, jnp.asarray(n, dense.dtype)), block)
        for ax in range(3)
    ]
    B_total = vb.shape[0]

    # extras: the one plane per axis where a shifted array differs from the
    # block itself — the only place out-of-block labels can appear. An axis
    # with a single block layer shifts pure fill and is skipped. Fill/pad
    # labels (>= n) are masked to IMAX so they never take a dictionary slot.
    planes = []
    if dense.shape[0] > bz:
        planes.append(nbrs[0][:, bz - 1, :, :].reshape(B_total, by * bx))
    if dense.shape[1] > by:
        planes.append(nbrs[1][:, :, by - 1, :].reshape(B_total, bz * bx))
    if dense.shape[2] > bx:
        planes.append(nbrs[2][:, :, :, bx - 1].reshape(B_total, bz * by))
    if planes:
        ex = jnp.concatenate(planes, axis=1).astype(jnp.int32)
        ex = jnp.where(ex >= n, _IMAX, ex)
    else:
        ex = jnp.full((B_total, 1), _IMAX, jnp.int32)
    e8 = -(-ex.shape[1] // K8)
    pad = e8 * K8 - ex.shape[1]
    if pad:
        ex = jnp.pad(ex, ((0, 0), (0, pad)), constant_values=_IMAX)
    ex = ex.reshape(B_total, e8, K8)

    group = min(group_blocks, B_total)
    if B_total <= group:
        return _pallas_group(vb, *nbrs, ex, w, block, L, n, interpret)
    groups = [_group_pad(a, group, n) for a in (vb, *nbrs)]
    groups.append(_group_pad(ex, group, _IMAX))

    def run_group(args):
        return _pallas_group(*args, w, block, L, n, interpret)

    outs = jax.lax.map(run_group, tuple(groups))
    # stack group outputs back to a flat block axis, drop padding blocks
    flat = [o.reshape((-1,) + o.shape[2:])[:B_total] for o in outs]
    return tuple(flat)


def _pallas_group(vb, vrz, vry, vrx, ex, w, block, L, n, interpret):
    """One pallas_call over a group of blocks; see `_pallas_main_pass`."""
    B = vb.shape[0]
    bz, by, bx = block
    K = bz * by * bx
    kernel = _kernel_factory(block, L, n)
    WP = w.shape[0]  # transposed [Wp, K] weight/selector table
    cols, outw = _packed_layout(L)
    K8 = K // 8
    E8 = ex.shape[1]
    # Mosaic constraint: a block's last two dims must be (8,128)-divisible
    # or EQUAL the array dims — hence rank-3 [B, 8, ·]/[B, L, ·] shapes so
    # the per-grid-step "1" never lands in the trailing two positions.
    mat = lambda i: (i, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        # larger dictionaries (L = 64 after a dict-overflow retry) need
        # >16 MB of scoped VMEM (the default limit); the v5e has 128 MB,
        # so raise the ceiling for headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, 8, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E8, K8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((WP, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, outw), mat, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, outw), jnp.int32),
        interpret=interpret,
    )(
        vb.reshape(B, 8, K8),
        vrz.reshape(B, 8, K8),
        vry.reshape(B, 8, K8),
        vrx.reshape(B, 8, K8),
        ex,
        w,
    )

    def sl(name):
        a, b = cols[name]
        return out[:, :, a:b]

    return (
        sl("ids")[:, :, 0], sl("mom"), sl("bbmin"), sl("bbmax"),
        sl("pz"), sl("py"), sl("px"), sl("ovf")[:, 0, 0] > 0,
    )


def _reconstruct_rows(mom_local, bbmin, bbmax, offs, wide=False):
    """Local → global-coordinate moment columns, int32-exact piecewise.

    mom_local: [B, L, 2F] (lo/hi pairs per local feature); offs [B, 3].
    Output cols [B, L, 34/52]: `_moment_pieces` (the shared contract —
    see its docstring for piece order, assembly shifts, and the
    width-dependent exactness bounds enforced by `_check_static_pallas`).
    """
    def f(idx):
        return mom_local[..., 2 * idx] + (mom_local[..., 2 * idx + 1] << _WSHIFT)

    C = f(0)
    s1 = {0: f(1), 1: f(3), 2: f(6)}  # local Σz, Σy, Σx
    s2 = {(0, 0): f(2), (1, 1): f(4), (0, 1): f(5),
          (2, 2): f(7), (0, 2): f(8), (1, 2): f(9)}
    o = {d: offs[:, d][:, None].astype(jnp.int32) for d in range(3)}

    cols = jnp.stack(_moment_pieces(C, s1, s2, o, wide), axis=-1)
    # absent slots keep their segment-min/max identities (IMAX / -1)
    gmin = jnp.where(bbmin < _IMAX, bbmin + offs[:, None, :], _IMAX)
    gmax = jnp.where(bbmax >= 0, bbmax + offs[:, None, :], -1)
    return cols, gmin, gmax


def _moment_piece_shifts(npieces: int):
    """Assembly shift of each piece column of one second moment — the
    `_moment_pieces` contract expressed as data (narrow 5-piece / wide
    8-piece), shared by `assemble_moments_pallas` and the packed-readback
    device assembly."""
    return (0, 0, _QSHIFT, 0, _QSHIFT, 0, _QSHIFT, 2 * _QSHIFT) \
        if npieces == 8 else (0, 0, 0, 0, _QSHIFT)


def _pack_final_moments(table, gmin, gmax):
    """Device-side final moment assembly: split columns → base-2³² words.

    ``table``: [N, 68/104] int32 — the post-combine interleaved (lo, hi)
    split piece columns (each < 2³¹, `_check_static_pallas` bounds).
    Output [N, 26] int32: value lo-words 10 | value hi-words 10 | gmin 3 |
    gmax 3 (values: count, Σz, Σy, Σx, then the 6 second moments), where
    value = uint32(lo) + (hi << 32). This is pure elementwise int32 VPU
    math, and it shrinks the moment readback ~2.9× (74 → 26 int32 columns
    per label — readback payload is wall-clock on the relayed link).

    Exactness: every 64-bit value is accumulated as four base-2¹⁶ limbs.
    Each split column contributes ≤4 bounded sub-words (col & 0xffff,
    col >> 16, each further split by the in-limb shift); limb partial sums
    stay ≪ 2³¹, and carries beyond limb 3 are provably zero because every
    contribution is nonnegative and the true value is < 2⁶¹ (Σc² at the
    wide contract's 46k-voxel extents). Verified bit-equal to the host
    `assemble_moments_pallas` path by tests/test_blocked.py.
    """
    ncols2 = table.shape[1]
    npieces = (ncols2 // 2 - 4) // 6
    qs = _moment_piece_shifts(npieces)
    specs = [[(0, 0)], [(1, 0)], [(2, 0)], [(3, 0)]]
    for m in range(6):
        base = 4 + npieces * m
        specs.append([(base + k, qs[k]) for k in range(npieces)])
    # limb accumulation shared with the blocked packer (round 5)
    los, his = blocked._pack_value_words(table, specs)
    return jnp.concatenate(
        [jnp.stack(los, axis=1), jnp.stack(his, axis=1), gmin, gmax], axis=1
    )


def assemble_moments_packed(words: np.ndarray) -> dict:
    """Host decode of `_pack_final_moments` output — same dict contract as
    `assemble_moments_pallas`."""
    w = np.asarray(words, np.int32)
    lo = w[:, :10].astype(np.uint32).astype(np.int64)
    hi = w[:, 10:20].astype(np.uint32).astype(np.int64)
    vals = lo + (hi << 32)
    count = vals[:, 0]
    s1 = vals[:, 1:4]
    s2 = vals[:, 4:10]
    cmin = w[:, 20:23].astype(np.int64)
    cmax = w[:, 23:26].astype(np.int64)
    empty = count == 0
    cmin[empty] = 0
    cmax[empty] = 0
    return {"count": count, "s1": s1, "s2": s2, "cmin": cmin, "cmax": cmax}


def assemble_moments_pallas(table: np.ndarray, gmin, gmax) -> dict:
    """Exact int64 assembly of the split global columns.

    ``table``: [N, 68] (narrow 5-piece contract) or [N, 104] (wide
    8-piece) int32 — the width names the contract (`_moment_pieces`)."""
    t = table.astype(np.int64)
    npieces = (table.shape[1] // 2 - 4) // 6  # 5 narrow / 8 wide
    vals = [
        t[:, 2 * c] + (t[:, 2 * c + 1] << _SPLIT)
        for c in range(table.shape[1] // 2)
    ]
    count = vals[0]
    s1 = np.stack(vals[1:4], axis=1)
    s2_cols = []
    for m in range(6):
        p = vals[4 + npieces * m: 4 + npieces * (m + 1)]
        if npieces == 8:
            # [S2_loc, oi_lo·s1j, oi_hi·s1j, oj_lo·s1i, oj_hi·s1i,
            #  C·q_lo, C·q_mid, C·q_hi] — hi pieces shifted back up
            s2_cols.append(
                p[0]
                + p[1] + (p[2] << _QSHIFT)
                + p[3] + (p[4] << _QSHIFT)
                + p[5] + (p[6] << _QSHIFT) + (p[7] << (2 * _QSHIFT))
            )
        else:
            # [S2_loc, oi·s1j, oj·s1i, C·q_lo, C·q_hi]
            s2_cols.append(
                p[0] + p[1] + p[2] + p[3] + (p[4] << _QSHIFT)
            )
    s2 = np.stack(s2_cols, axis=1)
    cmin = np.asarray(gmin, dtype=np.int64)
    cmax = np.asarray(gmax, dtype=np.int64)
    empty = count == 0
    cmin[empty] = 0
    cmax[empty] = 0
    return {"count": count, "s1": s1, "s2": s2, "cmin": cmin, "cmax": cmax}


def build_pallas_slab_fn(slab_shape, n_labels, cfg: PallasConfig, interpret,
                         wide=None):
    """Per-slab pallas pass for a static slab shape (shared by the
    single-device sweep and the z-slab shard_map pipeline).

    Returns fn(dense_slab, z_off) -> (ids [B, L], cols [B·L, C] (split),
    gmin/gmax rows, los, his, counts, tags, dict_ovf, pair_ovf) with all z
    coordinates offset by the traced scalar z_off.

    ``wide`` picks the moment-column contract (`_moment_pieces`); None
    derives it from ``slab_shape`` — callers whose z_off exceeds the slab
    extent (the sharded z-slab pipeline, where offsets are GLOBAL) must
    pass the wide flag derived from the GLOBAL padded shape instead.
    """
    block = cfg.block
    L = cfg.max_labels_per_block
    kp = cfg.max_pairs_per_block
    kps = kp if isinstance(kp, tuple) else (kp, kp, kp)
    n = n_labels
    if wide is None:
        wide = _check_static_pallas(slab_shape, n_labels, cfg)
    offs_np = _block_offsets_np(slab_shape, block)

    def slab_pass(dense_slab, z_off):
        # keep uint16 end-to-end — at 1024³ the int32 copies alone would
        # blow HBM. Sound only while every id (incl. the pad label n) fits
        # uint16; larger label counts stay in int32.
        if dense_slab.dtype != jnp.uint16 and n <= 65535:
            dense_slab = dense_slab.astype(jnp.uint16)
        elif dense_slab.dtype not in (jnp.uint16, jnp.int32):
            dense_slab = dense_slab.astype(jnp.int32)
        dense = _pad_to_blocks(dense_slab, n, block)
        offs = jnp.asarray(offs_np).at[:, 0].add(jnp.asarray(z_off, jnp.int32))

        # the main pass counts cross-block faces via the globally shifted
        # neighbor arrays — the in-slab pair work is exactly these dots (no
        # seam pass); the slab's own far faces pair with the fill label n
        # and drop out, which is what the sharded cross-slab halo expects
        if _v2_eligible(block, n):
            # v2 reconstructs global split cols + bbox in-kernel
            (ids, cols, gmin_l, gmax_l, pz, py, px, dovf) = _pallas_main_pass(
                dense, block, L, n, interpret, offs=offs, pack=cfg.pack,
                wide=wide, dict_rows=cfg.dict_rows,
            )
        else:
            (ids, mom_local, bbmin, bbmax, pz, py, px, dovf) = (
                _pallas_main_pass(dense, block, L, n, interpret)
            )
            cols, gmin_l, gmax_l = _reconstruct_rows(
                mom_local, bbmin, bbmax, offs, wide
            )
            cols = blocked._split_rows(cols)  # [B, L, 68/104]
        dict_overflow = jnp.any(dovf)
        B = ids.shape[0]

        los, his, counts, tags = [], [], [], []
        pair_overflow = jnp.zeros((), bool)
        # measured per-axis p100 of nonzero entries per [L, L] pair matrix:
        # lets the caller tighten max_pairs_per_block for later runs — the
        # kp buffers set the input size of the global pair sort, the
        # dominant post-kernel stage (~80 ms of the 512³ pass at kp=128)
        pair_nz = []
        for ax, mats in enumerate((pz, py, px)):
            lo, hi, ct, ov, nz_max = _compact_pair_mats(
                mats, ids, ids, n, kps[ax]
            )
            los.append(lo)
            his.append(hi)
            counts.append(ct)
            tags.append(jnp.full(lo.shape, ax, jnp.int32))
            pair_overflow = pair_overflow | jnp.any(ov)
            pair_nz.append(nz_max)
        pair_nz = jnp.stack(pair_nz)

        return (
            ids,
            cols.reshape(B * L, -1),
            gmin_l.reshape(B * L, 3),
            gmax_l.reshape(B * L, 3),
            jnp.concatenate(los),
            jnp.concatenate(his),
            jnp.concatenate(counts),
            jnp.concatenate(tags),
            dict_overflow,
            pair_overflow,
            pair_nz,
        )

    return slab_pass


#: static split description of the sweep's ONE flat int32 readback buffer:
#: [pair_rows·max_entries pairs | 11 stats | rows·mom_cols moments]
#: (moments LAST so bucket-mode callers can truncate unused label rows
#: with a single device-side tail slice before the device_get).
SweepLayout = collections.namedtuple(
    "SweepLayout", ["pair_rows", "max_entries", "mom_cols", "rows"]
)


def split_sweep_flat(flat: np.ndarray, layout: SweepLayout):
    """Host-side split of the sweep's flat buffer into
    (packed_mom [rows', 26], pairs [pair_rows, E], stats [11]) views —
    rows' may be smaller than layout.rows when the caller truncated
    bucket-mode padding rows on device."""
    r, e, c, _ = layout
    head = r * e + 11
    pairs = flat[: r * e].reshape(r, e)
    stats = flat[r * e: head]
    packed_mom = flat[head:].reshape(-1, c)
    return packed_mom, pairs, stats


def _build_pallas_sweep(shape, n_labels, cfg: PallasConfig, interpret: bool):
    n = n_labels
    wide = _check_static_pallas(shape, n, cfg)
    max_entries = 3 * cfg.derived_max_pairs(n)
    slab_pass = build_pallas_slab_fn(shape, n, cfg, interpret, wide=wide)
    pair_rows = 2 if 4 * n * n < int(_IMAX) else 3
    layout = SweepLayout(pair_rows, max_entries, 26, n)

    def sweep(dense):
        (
            ids, cols, gmin_l, gmax_l, los, his, counts, tags, dovf, povf,
            pair_nz,
        ) = slab_pass(dense, 0)
        table, gmin, gmax, rows_live, row_ovf = blocked._global_moment_combine(
            ids, cols, gmin_l, gmax_l, n, row_cap=cfg.row_cap,
            return_live=True,
        )
        packed_mom = _pack_final_moments(table, gmin, gmax)
        k1, k2, total, n_runs, n_live, cap_ovf = _sorted_pair_reduce(
            los, his, tags, counts, max_entries, n_labels=n, unpack=False,
            entry_cap=cfg.entry_cap, return_live=True,
        )
        # ONE flat readback buffer, not 3 (nor the original 12): the
        # tunneled relay charges per-buffer latency on device_get
        # (scripts/tpu_readback_micro.py), so the pair arrays, the [11]
        # stats vector (layout: SWEEP_STATS) and the packed moment table
        # concatenate into a single int32 stream split host-side by the
        # static `SweepLayout` (`split_sweep_flat`).
        if k2.shape[0] == 1:  # packed-key mode: k2 is the [1] n4 marker
            pairs = jnp.stack([k1, total])
        else:  # two-key mode (4n² ≥ 2³¹)
            pairs = jnp.stack([k1, k2, total])
        stats = jnp.stack(
            [n_runs, dovf.astype(jnp.int32), povf.astype(jnp.int32),
             pair_nz[0], pair_nz[1], pair_nz[2], n_live,
             cap_ovf.astype(jnp.int32), rows_live,
             row_ovf.astype(jnp.int32), k2[0]]
        )
        return jnp.concatenate(
            [pairs.reshape(-1), stats, packed_mom.reshape(-1)]
        )

    return jax.jit(sweep), layout


#: index layout of the sweep's stats vector (see `_build_pallas_sweep`)
SWEEP_STATS = (
    "n_runs", "dict_ovf", "pair_ovf", "pair_nz0", "pair_nz1", "pair_nz2",
    "n_live", "cap_ovf", "rows_live", "row_ovf", "k2_marker",
)


_SWEEP_CACHE: dict = {}


def pallas_sweep(
    dense: jax.Array,
    n_labels: int,
    cfg: Optional[PallasConfig] = None,
    interpret: Optional[bool] = None,
):
    """Run the Pallas fused sweep.

    Returns ``(flat, layout)``: one flat int32 device buffer (see
    `SweepLayout` / `split_sweep_flat`) holding the reduced pair table,
    the SWEEP_STATS vector and the packed moment table
    (`assemble_moments_packed` decodes the latter)."""
    cfg = cfg or PallasConfig()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = (tuple(dense.shape), n_labels, cfg, interpret)
    hit = _SWEEP_CACHE.get(key)
    if hit is None:
        hit = _build_pallas_sweep(tuple(dense.shape), n_labels, cfg, interpret)
        _SWEEP_CACHE[key] = hit
    fn, layout = hit
    return fn(dense), layout
