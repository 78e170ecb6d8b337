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
    max_labels_per_block: int = 64  # L
    max_pairs_per_block: int = 256  # kp for the XLA compaction stage
    max_pairs: int = 0
    use_pltpu_roll: bool = True  # False -> jnp.roll (interpret mode)

    def derived_max_pairs(self, n_labels: int) -> int:
        if self.max_pairs:
            return self.max_pairs
        return max(2048, 24 * n_labels)


def _check_static_pallas(shape, n_labels, cfg: PallasConfig) -> None:
    bz, by, bx = cfg.block
    K = bz * by * bx
    L = cfg.max_labels_per_block
    n = n_labels
    if n * n * 4 + 3 > int(_IMAX):
        raise ValueError("n_labels exceeds the int32 pair-key space")
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
    """Static [K, 2·_N_FEATS] bf16 lo/hi-split local-coordinate weights."""
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
    w = np.stack(cols, axis=1)
    assert w.max() < (1 << _WSHIFT)
    return w.astype(jnp.bfloat16)


def _selectors(block) -> Tuple[np.ndarray, np.ndarray]:
    """SelZ [S, bz], SelY [S, by] presence selectors (s = z·by + y)."""
    bz, by, _ = block
    s = np.arange(bz * by)
    sel_z = (s[:, None] // by == np.arange(bz)[None, :]).astype(np.float32)
    sel_y = (s[:, None] % by == np.arange(by)[None, :]).astype(np.float32)
    return sel_z.astype(jnp.bfloat16), sel_y.astype(jnp.bfloat16)


def _kernel_factory(block, L, use_pltpu_roll):
    bz, by, bx = block
    K = bz * by * bx
    S = bz * by  # sublane rows in the [S, X] view

    def roll(a, shift, axis):
        if use_pltpu_roll:
            return pltpu.roll(a, shift=shift, axis=axis)
        return jnp.roll(a, shift, axis=axis)

    def kernel(vals_ref, w_ref, selz_ref, sely_ref,
               ids_ref, mom_ref, bbmin_ref, bbmax_ref,
               pz_ref, py_ref, px_ref, ovf_ref):
        v = vals_ref[0].reshape(S, bx)  # [S, X] int32

        # ---- 1. dictionary: iterative masked min, iota-select stores ------
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        def body(l, carry):
            mask, ids = carry
            m = jnp.min(jnp.where(mask, v, _IMAX))
            ids = jnp.where(lane_l == l, m, ids)
            return mask & (v != m), ids

        mask0 = v == v
        ids0 = jnp.full((1, L), _IMAX, jnp.int32)
        mask, ids = jax.lax.fori_loop(0, L, body, (mask0, ids0))
        ids_ref[0] = ids[0]
        ovf_ref[0, 0] = jnp.any(mask).astype(jnp.int32)

        # ---- 2. one-hot [L, S, X] bf16 -------------------------------------
        oh = (v[None, :, :] == ids.reshape(L, 1, 1)).astype(jnp.bfloat16)
        oh2 = oh.reshape(L, K)

        # ---- 3. local moments: one MXU dot vs static split weights --------
        mom = jax.lax.dot_general(
            oh2, w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, 2F], exact integers in f32
        mom_ref[0] = mom.astype(jnp.int32)

        # ---- 4. bbox supports: lane reduce + selector dots -----------------
        smax = jnp.max(oh, axis=2)  # [L, S] presence per row
        zs = jax.lax.dot_general(
            smax, selz_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, bz] (counts > 0 ⇔ present)
        ys = jax.lax.dot_general(
            smax, sely_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, by]
        xs = jnp.max(oh, axis=1)  # [L, X]
        mins, maxs = [], []
        for supp, ln in ((zs, bz), (ys, by), (xs, bx)):
            present = supp > 0
            ii = jax.lax.broadcasted_iota(jnp.int32, (L, ln), 1)
            mins.append(jnp.min(jnp.where(present, ii, _IMAX), axis=1))
            maxs.append(jnp.max(jnp.where(present, ii, -1), axis=1))
        bbmin_ref[0] = jnp.stack(mins, axis=1)
        bbmax_ref[0] = jnp.stack(maxs, axis=1)

        # ---- 5. pair matmuls: roll + mask per axis --------------------------
        si = jax.lax.broadcasted_iota(jnp.int32, (L, S, bx), 1)
        xi = jax.lax.broadcasted_iota(jnp.int32, (L, S, bx), 2)

        def face_dot(a, b):
            return jax.lax.dot_general(
                a.reshape(L, K), b.reshape(L, K), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)

        # z faces: rows s and s+by  (b[i] = a[i+by] ⇒ roll by S-by)
        a_z = jnp.where(si < S - by, oh, 0)
        pz_ref[0] = face_dot(a_z, roll(oh, S - by, 1))
        # y faces: rows s and s+1 within a z-group of by rows
        a_y = jnp.where(si % by < by - 1, oh, 0)
        py_ref[0] = face_dot(a_y, roll(oh, S - 1, 1))
        # x faces: lanes x and x+1
        a_x = jnp.where(xi < bx - 1, oh, 0)
        px_ref[0] = face_dot(a_x, roll(oh, bx - 1, 2))

    return kernel


def _pallas_main_pass(vb, w, selz, sely, L, use_pltpu_roll, interpret):
    """vb: [B, bz, by, bx] int32 blockified stack."""
    B, bz, by, bx = vb.shape
    kernel = _kernel_factory((bz, by, bx), L, use_pltpu_roll)
    F2 = 2 * _N_FEATS
    K = bz * by * bx
    S = bz * by
    out_shapes = (
        jax.ShapeDtypeStruct((B, L), jnp.int32),        # ids
        jax.ShapeDtypeStruct((B, L, F2), jnp.int32),    # local moments
        jax.ShapeDtypeStruct((B, L, 3), jnp.int32),     # bbox min (local)
        jax.ShapeDtypeStruct((B, L, 3), jnp.int32),     # bbox max (local)
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats z
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats y
        jax.ShapeDtypeStruct((B, L, L), jnp.int32),     # pair mats x
        jax.ShapeDtypeStruct((B, 1), jnp.int32),        # dict overflow
    )
    row = lambda i: (i, 0)  # noqa: E731
    mat = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, bz, by, bx), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((K, F2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, bz), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, by), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, F2), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 3), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 3), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, L), mat, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), row, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(vb, w, selz, sely)


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


def _build_pallas_sweep(shape, n_labels, cfg: PallasConfig, interpret: bool):
    block = cfg.block
    L = cfg.max_labels_per_block
    kp = cfg.max_pairs_per_block
    n = n_labels
    _check_static_pallas(shape, n, cfg)
    max_entries = 3 * cfg.derived_max_pairs(n)
    gz, gy, gx = _grid(shape, block)
    bz, by, bx = block
    w = jnp.asarray(_weight_table(block))
    selz_np, sely_np = _selectors(block)
    selz = jnp.asarray(selz_np)
    sely = jnp.asarray(sely_np)
    use_roll = cfg.use_pltpu_roll and not interpret

    ozz, oyy, oxx = np.meshgrid(
        np.arange(gz) * bz, np.arange(gy) * by, np.arange(gx) * bx, indexing="ij"
    )
    offs_np = np.stack(
        [ozz.reshape(-1), oyy.reshape(-1), oxx.reshape(-1)], axis=1
    ).astype(np.int32)

    def sweep(dense):
        dense = _pad_to_blocks(dense.astype(jnp.int32), n, block)
        vb = _blockify(dense, block)  # [B, bz, by, bx]
        offs = jnp.asarray(offs_np)

        (ids, mom_local, bbmin, bbmax, pz, py, px, dovf) = _pallas_main_pass(
            vb, w, selz, sely, L, use_roll, interpret
        )
        dict_overflow = jnp.any(dovf > 0)

        cols, gmin_l, gmax_l = _reconstruct_rows(mom_local, bbmin, bbmax, offs)
        cols = blocked._split_rows(cols)  # [B, L, 68]

        B = ids.shape[0]
        table, gmin, gmax = blocked._global_moment_combine(
            ids, cols.reshape(B * L, -1),
            gmin_l.reshape(B * L, 3), gmax_l.reshape(B * L, 3), n,
        )

        gkeys, counts, tags = [], [], []
        pair_overflow = jnp.zeros((), bool)
        for ax, mats in enumerate((pz, py, px)):
            gk, ct, ov = _compact_pair_mats(mats, ids, ids, n, kp)
            gkeys.append(gk)
            counts.append(ct)
            tags.append(jnp.full(gk.shape, ax, jnp.int32))
            pair_overflow = pair_overflow | jnp.any(ov)

        sk, sc, st, dovf_s, povf_s = seam_pair_entries(dense, block, n, L, kp)
        gkeys += sk
        counts += sc
        tags += st
        dict_overflow = dict_overflow | dovf_s
        pair_overflow = pair_overflow | povf_s

        skey, total, n_runs = _sorted_pair_reduce(
            jnp.concatenate(gkeys), jnp.concatenate(counts),
            jnp.concatenate(tags), n, max_entries,
        )
        return (
            table, gmin, gmax, skey, total, n_runs,
            dict_overflow, pair_overflow,
        )

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
