"""Pallas TPU kernel: the whole per-block pipeline fused in VMEM.

The XLA blocked engine (ops/blocked.py) materializes the per-block one-hot
tensor in HBM and re-reads it for the dictionary pass, three marginals and
six pair-matmul slices (~100 GB of HBM traffic at 512³). This kernel keeps
everything for one block resident in VMEM and reads each voxel from HBM
exactly once:

  per grid step (one 8×16×128 block, K = 16384 voxels):
    1. dictionary extraction — L iterations of masked min over the block,
       dictionary built by iota-select (no dynamic stores)
    2. one-hot OH [L, S, X] bf16 against the dictionary
    3. LOCAL integer moments — one MXU dot against a static hi/lo-split
       weight table (parts < 2⁷ are bf16-exact; f32 sums < 2²⁴ ⇒ exact)
    4. bbox supports — lane-reduce + tiny selector-matrix dots (no reshapes
       across the lane boundary)
    5. wall-pair counts — one-hot outer products per axis against the
       GLOBALLY shifted (+1 voxel, label-n fill) neighbor arrays, so the
       [L, L] MXU dots count cross-block faces too — no seam pass exists

Downstream (pure XLA, tiny): exact global-coordinate reconstruction from
local moments + block offsets with overflow-proof int32 splitting, then the
same segment combine / top_k pair compaction / sort-reduce as the blocked
engine. Outputs are bit-identical to the other engines (enforced by tests).

Static bounds (checked): offsets·Σc_local and C·(oi·oj) pieces must fit
int32 — holds for stacks up to ~1024³ at the default block; larger falls
back to the XLA blocked engine.
"""

from __future__ import annotations

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


@dataclasses.dataclass(frozen=True)
class PallasConfig:
    block: Tuple[int, int, int] = (8, 16, 128)
    max_labels_per_block: int = 32  # L (measured p100 = 22 on 512³ stacks)
    max_pairs_per_block: int = 128  # kp for the XLA compaction stage
    max_pairs: int = 0
    seam_tile: Tuple[int, int] = (64, 256)  # bigger tiles ⇒ fewer top_k rows
    seam_max_labels: int = 64  # seam tiles span more cells than blocks
    max_pairs_per_seam_tile: int = 256

    def derived_max_pairs(self, n_labels: int) -> int:
        if self.max_pairs:
            return self.max_pairs
        return max(2048, 24 * n_labels)


def _check_static_pallas(shape, n_labels, cfg: PallasConfig) -> None:
    bz, by, bx = cfg.block
    K = bz * by * bx
    L = cfg.max_labels_per_block
    n = n_labels
    if n * 4 + 3 > int(_IMAX):
        raise ValueError(
            "n_labels exceeds the int32 (hi·4 + axis) sort-key space "
            "(n must be < 2^29)"
        )
    if K * L * L > int(_IMAX):
        raise ValueError("count·L² pair packing would overflow int32")
    padded = tuple(g * b for g, b in zip(_grid(shape, cfg.block), cfg.block))
    off_max = [p - b for p, b in zip(padded, cfg.block)]
    s1_max = [K * (b - 1) for b in cfg.block]
    qmask = (1 << _QSHIFT) - 1
    too_big = K * qmask > int(_IMAX)
    for i in range(3):
        for j in range(3):
            too_big |= off_max[i] * s1_max[j] > int(_IMAX)
            too_big |= K * ((off_max[i] * off_max[j]) >> _QSHIFT) > int(_IMAX)
    if too_big:
        raise ValueError(
            "stack too large for the Pallas engine's int32 reconstruction; "
            "use the blocked engine"
        )


def _weight_table(block) -> np.ndarray:
    """Static [K, 2·_N_FEATS + bz + by + bx] bf16 weight/selector table.

    First 2·_N_FEATS columns: lo/hi-split local-coordinate moment weights
    (parts < 2^_WSHIFT). Remaining columns: coordinate-plane presence
    selectors (0/1) for the bbox supports — all consumed by ONE MXU dot
    against the one-hot.
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
    w = np.stack(cols, axis=1)
    assert w.max() < (1 << _WSHIFT)
    return w.astype(jnp.bfloat16)


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

        # ---- 1. dictionary: iterative masked min over the block PLUS the
        # compact ``extras`` rows (the neighbor arrays' boundary planes,
        # pre-packed in XLA — a neighbor label absent from the block itself
        # can only live there, and it must be in the dictionary or its face
        # pair would silently vanish from the one-hot dot). Labels >= n
        # (fill/pad) arrive pre-masked to IMAX and never take a slot. ids
        # built [L, 1] by sublane-iota select. STATICALLY UNROLLED: a
        # fori_loop here carries i1 masks whose Mosaic layouts disagree
        # between loop entry and body and fail to compile.
        v_all = jnp.concatenate([v8, ex_ref[0]], axis=0)  # [8 + E8, K/8]
        sub_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        mask = (v_all == v_all) & (v_all < n)
        ids = jnp.full((L, 1), _IMAX, jnp.int32)
        for l in range(L):
            m = jnp.min(jnp.where(mask, v_all, _IMAX))
            ids = jnp.where(sub_l == l, m, ids)
            mask = mask & (v_all != m)
        ovf = jnp.broadcast_to(
            jnp.any(mask).astype(jnp.int32).reshape(1, 1), (L, 1)
        )

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

        # ---- 3. moments + bbox supports: ONE MXU dot ----------------------
        mom = jax.lax.dot_general(
            oh, w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, 2F + bz + by + bx], exact integers in f32
        momi = mom[:, :F2].astype(jnp.int32)

        mins, maxs = [], []
        col = F2
        for extent in (bz, by, bx):
            supp = mom[:, col:col + extent]  # [L, extent] voxel counts
            col += extent
            present = supp > 0
            ii = jax.lax.broadcasted_iota(jnp.int32, (L, extent), 1)
            mins.append(jnp.min(jnp.where(present, ii, _IMAX), axis=1))
            maxs.append(jnp.max(jnp.where(present, ii, -1), axis=1))
        bbmin = jnp.stack(mins, axis=1)
        bbmax = jnp.stack(maxs, axis=1)

        # ---- 4. pair matmuls against the globally shifted neighbors ------
        def face_dot(vr8):
            b = onehot(vr8[0].astype(jnp.int32))  # [L, K]
            return jax.lax.dot_general(
                oh, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        pieces = [ids, momi, bbmin, bbmax,
                  face_dot(vrz_ref), face_dot(vry_ref), face_dot(vrx_ref),
                  ovf]
        used = 8 + F2 + 3 * L
        if outw > used:
            pieces.append(jnp.zeros((L, outw - used), jnp.int32))
        out_ref[0] = jnp.concatenate(pieces, axis=1)

    return kernel


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


def _pallas_main_pass(dense, w, block, L, n, interpret, group_blocks=8192):
    """dense: block-padded [Z, Y, X] stack (uint16 or int32).

    Blockifies the stack and its three globally-shifted neighbor copies,
    packs each block's neighbor-boundary planes into a compact ``extras``
    array for the joint dictionary, then runs the kernel grid in `lax.map`
    groups so the per-group working set stays bounded at Gvoxel scale.
    Padding blocks carry the label n (the dropped segment)."""
    bz, by, bx = block
    K = bz * by * bx
    K8 = K // 8
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
    WCOLS = w.shape[1]
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
            pl.BlockSpec((K, WCOLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
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


def _reconstruct_rows(mom_local, bbmin, bbmax, offs):
    """Local → global-coordinate moment columns, int32-exact piecewise.

    mom_local: [B, L, 2F] (lo/hi pairs per local feature); offs [B, 3].
    Output cols [B, L, 34]: count, gΣc (3), and per second-moment (i,j) the
    five pieces [S2_loc, oi·Σcj, oj·Σci, C·qlo, C·qhi] assembled on the host
    as Σ₁+Σ₂+Σ₃+Σ₄+(Σ₅ << _QSHIFT).
    """
    def f(idx):
        return mom_local[..., 2 * idx] + (mom_local[..., 2 * idx + 1] << _WSHIFT)

    C = f(0)
    s1 = {0: f(1), 1: f(3), 2: f(6)}  # local Σz, Σy, Σx
    s2 = {(0, 0): f(2), (1, 1): f(4), (0, 1): f(5),
          (2, 2): f(7), (0, 2): f(8), (1, 2): f(9)}
    o = {d: offs[:, d][:, None].astype(jnp.int32) for d in range(3)}

    cols = [C]
    for d in range(3):
        cols.append(s1[d] + C * o[d])  # global Σc_d
    qmask = (1 << _QSHIFT) - 1
    # tri_pairs(3) order: zz, zy, zx, yy, yx, xx
    for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        q = o[i] * o[j]
        cols.extend([
            s2[(i, j)],
            o[i] * s1[j],
            o[j] * s1[i],
            C * (q & qmask),
            C * (q >> _QSHIFT),
        ])
    cols = jnp.stack(cols, axis=-1)  # [B, L, 34]
    # absent slots keep their segment-min/max identities (IMAX / -1)
    gmin = jnp.where(bbmin < _IMAX, bbmin + offs[:, None, :], _IMAX)
    gmax = jnp.where(bbmax >= 0, bbmax + offs[:, None, :], -1)
    return cols, gmin, gmax


def assemble_moments_pallas(table: np.ndarray, gmin, gmax) -> dict:
    """Exact int64 assembly of the split global columns ([N, 68] int32)."""
    t = table.astype(np.int64)
    vals = [t[:, 2 * c] + (t[:, 2 * c + 1] << _SPLIT) for c in range(34)]
    count = vals[0]
    s1 = np.stack(vals[1:4], axis=1)
    s2_cols = []
    for m in range(6):
        base = 4 + 5 * m
        s2_cols.append(
            vals[base] + vals[base + 1] + vals[base + 2]
            + vals[base + 3] + (vals[base + 4] << _QSHIFT)
        )
    s2 = np.stack(s2_cols, axis=1)
    cmin = np.asarray(gmin, dtype=np.int64)
    cmax = np.asarray(gmax, dtype=np.int64)
    empty = count == 0
    cmin[empty] = 0
    cmax[empty] = 0
    return {"count": count, "s1": s1, "s2": s2, "cmin": cmin, "cmax": cmax}


def build_pallas_slab_fn(slab_shape, n_labels, cfg: PallasConfig, interpret):
    """Per-slab pallas pass for a static slab shape (shared by the
    single-device sweep and the z-slab shard_map pipeline).

    Returns fn(dense_slab, z_off) -> (ids [B, L], cols [B·L, C] (split),
    gmin/gmax rows, los, his, counts, tags, dict_ovf, pair_ovf) with all z
    coordinates offset by the traced scalar z_off.
    """
    block = cfg.block
    L = cfg.max_labels_per_block
    kp = cfg.max_pairs_per_block
    n = n_labels
    gz, gy, gx = _grid(slab_shape, block)
    bz, by, bx = block
    w = jnp.asarray(_weight_table(block))

    ozz, oyy, oxx = np.meshgrid(
        np.arange(gz) * bz, np.arange(gy) * by, np.arange(gx) * bx, indexing="ij"
    )
    offs_np = np.stack(
        [ozz.reshape(-1), oyy.reshape(-1), oxx.reshape(-1)], axis=1
    ).astype(np.int32)

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
        (ids, mom_local, bbmin, bbmax, pz, py, px, dovf) = _pallas_main_pass(
            dense, w, block, L, n, interpret
        )
        dict_overflow = jnp.any(dovf)

        cols, gmin_l, gmax_l = _reconstruct_rows(mom_local, bbmin, bbmax, offs)
        cols = blocked._split_rows(cols)  # [B, L, 68]
        B = ids.shape[0]

        los, his, counts, tags = [], [], [], []
        pair_overflow = jnp.zeros((), bool)
        for ax, mats in enumerate((pz, py, px)):
            lo, hi, ct, ov = _compact_pair_mats(mats, ids, ids, n, kp)
            los.append(lo)
            his.append(hi)
            counts.append(ct)
            tags.append(jnp.full(lo.shape, ax, jnp.int32))
            pair_overflow = pair_overflow | jnp.any(ov)

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
        )

    return slab_pass


def _build_pallas_sweep(shape, n_labels, cfg: PallasConfig, interpret: bool):
    n = n_labels
    _check_static_pallas(shape, n, cfg)
    max_entries = 3 * cfg.derived_max_pairs(n)
    slab_pass = build_pallas_slab_fn(shape, n, cfg, interpret)

    def sweep(dense):
        ids, cols, gmin_l, gmax_l, los, his, counts, tags, dovf, povf = (
            slab_pass(dense, 0)
        )
        table, gmin, gmax = blocked._global_moment_combine(
            ids, cols, gmin_l, gmax_l, n
        )
        k1, k2, total, n_runs = _sorted_pair_reduce(
            los, his, tags, counts, max_entries
        )
        return table, gmin, gmax, k1, k2, total, n_runs, dovf, povf

    return jax.jit(sweep)


_SWEEP_CACHE: dict = {}


def pallas_sweep(
    dense: jax.Array,
    n_labels: int,
    cfg: Optional[PallasConfig] = None,
    interpret: Optional[bool] = None,
):
    """Run the Pallas fused sweep; same output contract as
    `blocked.blocked_sweep` except moments assemble via
    `assemble_moments_pallas` (no wshift)."""
    cfg = cfg or PallasConfig()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key = (tuple(dense.shape), n_labels, cfg, interpret)
    fn = _SWEEP_CACHE.get(key)
    if fn is None:
        fn = _build_pallas_sweep(tuple(dense.shape), n_labels, cfg, interpret)
        _SWEEP_CACHE[key] = fn
    return fn(dense)
