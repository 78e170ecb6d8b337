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
    5. wall-pair counts — roll+mask one-hot outer products per axis
       ([L, L] MXU dots; in-block faces only, seams handled outside)

Downstream (pure XLA, tiny): exact global-coordinate reconstruction from
local moments + block offsets with overflow-proof int32 splitting, then the
same segment combine / top_k pair compaction / sort-reduce as the blocked
engine, plus `ops.blocked.seam_pair_entries` for the block seams. Outputs
are bit-identical to the other engines (enforced by tests).

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
    _blockify,
    _compact_pair_mats,
    _grid,
    _group_pad,
    _pad_to_blocks,
    _sorted_pair_reduce,
    seam_pair_entries,
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


def _kernel_factory(block, L):
    bz, by, bx = block
    K = bz * by * bx

    def kernel(vals_ref, v8_ref, vrz_ref, vry_ref, vrx_ref, w_ref,
               ids_ref, mom_ref, bbmin_ref, bbmax_ref,
               pz_ref, py_ref, px_ref, ovf_ref):
        # Everything is 2D [·, K] — no layout-changing reshapes in-kernel
        # (Mosaic rejects shape casts that cross the lane boundary). Inputs
        # may arrive as uint16 (halves HBM for big stacks); cast per block.
        v = vals_ref[0].astype(jnp.int32)  # [1, K]
        v8 = v8_ref[0].astype(jnp.int32)  # [8, K/8] — full-sublane layout

        # ---- 1. dictionary: iterative masked min over the [8, K/8] view
        # (the [1, K] view would run the VPU at 1/8 occupancy); ids built
        # [L, 1] by sublane-iota select. STATICALLY UNROLLED: a fori_loop
        # here carries i1 masks whose Mosaic layouts disagree between loop
        # entry and body and fail to compile.
        sub_l = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)
        mask = v8 == v8
        ids = jnp.full((L, 1), _IMAX, jnp.int32)
        for l in range(L):
            m = jnp.min(jnp.where(mask, v8, _IMAX))
            ids = jnp.where(sub_l == l, m, ids)
            mask = mask & (v8 != m)
        ids_ref[0] = ids
        ovf_ref[0] = jnp.any(mask).astype(jnp.int32).reshape(1, 1)

        # ---- 2. one-hot [L, K] bf16: one broadcast compare ----------------
        oh = (v == ids).astype(jnp.bfloat16)  # [1,K] vs [L,1] -> [L,K]

        # ---- 3. moments + bbox supports: ONE MXU dot ----------------------
        mom = jax.lax.dot_general(
            oh, w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, 2F + bz + by + bx], exact integers in f32
        F2 = 2 * _N_FEATS
        mom_ref[0] = mom[:, :F2].astype(jnp.int32)

        mins, maxs = [], []
        col = F2
        for extent in (bz, by, bx):
            supp = mom[:, col:col + extent]  # [L, extent] voxel counts
            col += extent
            present = supp > 0
            ii = jax.lax.broadcasted_iota(jnp.int32, (L, extent), 1)
            mins.append(jnp.min(jnp.where(present, ii, _IMAX), axis=1))
            maxs.append(jnp.max(jnp.where(present, ii, -1), axis=1))
        bbmin_ref[0] = jnp.stack(mins, axis=1)
        bbmax_ref[0] = jnp.stack(maxs, axis=1)

        # ---- 4. pair matmuls: shifted-neighbor one-hots (shifts done in
        # XLA — Mosaic has no wide-vector rotate) + modular-iota masks
        k_i = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        x_i = k_i % bx
        y_i = (k_i // bx) % by
        z_i = k_i // (bx * by)

        def face_dot(amask, vr):
            a = jnp.where(amask, oh, 0)
            b = (vr.astype(jnp.int32) == ids).astype(jnp.bfloat16)  # [L, K]
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        pz_ref[0] = face_dot(z_i < bz - 1, vrz_ref[0])
        py_ref[0] = face_dot(y_i < by - 1, vry_ref[0])
        px_ref[0] = face_dot(x_i < bx - 1, vrx_ref[0])

    return kernel


def _pallas_main_pass(vb_all, w, block, L, n, interpret, group_blocks=8192):
    """vb_all: [B, bz, by, bx] blockified stack (uint16 or int32).

    Runs the kernel grid in `lax.map` groups so the three rolled
    neighbor copies (and their 2× sublane-padding for 16-bit layouts) only
    materialize per group — the ungrouped version OOMs HBM at 1024³.
    Padding blocks carry the label n (the dropped segment)."""
    B_total = vb_all.shape[0]
    group = min(group_blocks, B_total)
    if B_total <= group:
        return _pallas_group(vb_all, w, block, L, interpret)
    vb_groups = _group_pad(vb_all, group, n)

    def run_group(vb):
        return _pallas_group(vb, w, block, L, interpret)

    outs = jax.lax.map(run_group, vb_groups)
    # stack group outputs back to a flat block axis, drop padding blocks
    flat = [o.reshape((-1,) + o.shape[2:])[:B_total] for o in outs]
    return tuple(flat)


def _pallas_group(vb, w, block, L, interpret):
    """One pallas_call over a group of blocks; see `_pallas_main_pass`."""
    B = vb.shape[0]
    bz, by, bx = block
    K = bz * by * bx
    kernel = _kernel_factory(block, L)
    F2 = 2 * _N_FEATS
    WCOLS = w.shape[1]
    vb_flat = vb.reshape(B, 1, K)
    vb8 = vb.reshape(B, 8, K // 8)
    vrz = jnp.roll(vb, -1, axis=1).reshape(B, 1, K)
    vry = jnp.roll(vb, -1, axis=2).reshape(B, 1, K)
    vrx = jnp.roll(vb, -1, axis=3).reshape(B, 1, K)
    # Mosaic constraint: a block's last two dims must be (8,128)-divisible
    # or EQUAL the array dims — hence rank-3 [B, 1, ·]/[B, L, ·] shapes so
    # the per-grid-step "1" never lands in the trailing two positions.
    out_shapes = (
        jax.ShapeDtypeStruct((B, L, 1), jnp.int32),     # ids
        jax.ShapeDtypeStruct((B, L, F2), jnp.int32),    # local moments
        jax.ShapeDtypeStruct((B, L, 3), jnp.int32),     # bbox min (local)
        jax.ShapeDtypeStruct((B, L, 3), jnp.int32),     # bbox max (local)
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats z
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats y
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats x
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),     # dict overflow
    )
    mat = lambda i: (i, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        # larger dictionaries (L = 64 after a dict-overflow retry) need
        # ~16.01 MB of scoped VMEM — just past the 16 MB default limit;
        # the v5e has 128 MB, so raise the ceiling for headroom
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, 1, K), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K // 8), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, WCOLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, 1), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, F2), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 3), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 3), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), mat, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(vb_flat, vb8, vrz, vry, vrx, w)
    ids, mom, bbmin, bbmax, pz, py, px, ovf = outs
    return ids[:, :, 0], mom, bbmin, bbmax, pz, py, px, ovf[:, 0]


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
        vb = _blockify(dense, block)  # [B, bz, by, bx]
        offs = jnp.asarray(offs_np).at[:, 0].add(jnp.asarray(z_off, jnp.int32))

        (ids, mom_local, bbmin, bbmax, pz, py, px, dovf) = _pallas_main_pass(
            vb, w, block, L, n, interpret
        )
        dict_overflow = jnp.any(dovf > 0)

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

        slo, shi, sct, stg, dovf_s, povf_s = seam_pair_entries(
            dense, block, n, cfg.seam_max_labels,
            cfg.max_pairs_per_seam_tile, tile=cfg.seam_tile,
        )
        los += slo
        his += shi
        counts += sct
        tags += stg
        dict_overflow = dict_overflow | dovf_s
        pair_overflow = pair_overflow | povf_s

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
