"""The wide (8-piece offset-split) moment reconstruction contract.

`_moment_pieces(wide=True)` lifts the pallas engine's int32 ceiling from
~1024 voxels per axis to ~46k (reference scope: the upstream library is
pure NumPy and bounded only by host RAM — SURVEY.md §2.1; these tests pin
that the lifted bound stays bit-exact). Three layers:

1. static-check triage: which shapes keep the compact 5-piece contract,
   which switch to wide, which must fall back to the blocked engine
2. the wide kernel path is bit-identical to the narrow one on shapes
   where both are exact (same FeatureTable, including pair COO order)
3. exactness at offsets near the new 46k bound, against an int64 oracle
   (both the v1 XLA `_reconstruct_rows` and the in-kernel v2 path via a
   large traced z_off — the sharded-pipeline usage)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.core.synthetic import voronoi_stack
from tissue_analysis_tpu.ops import blocked, pallas_block
from tissue_analysis_tpu.ops.pallas_block import PallasConfig


def test_check_static_triage():
    cfg = PallasConfig()
    # common cases keep the narrow contract (readback stays 2/3 the bytes)
    assert pallas_block._check_static_pallas((512,) * 3, 2031, cfg) is False
    assert pallas_block._check_static_pallas((1024,) * 3, 16241, cfg) is False
    # wide unlocks the 4096² 2D lift and 2048²-wide out-of-core slabs
    assert pallas_block._check_static_pallas((1, 4096, 4096), 4000, cfg)
    assert pallas_block._check_static_pallas((128, 2048, 2048), 50000, cfg)
    # > 2^16 blocks exceeds the segment-sum row budget -> blocked engine
    with pytest.raises(ValueError):
        pallas_block._check_static_pallas((1536,) * 3, 50000, cfg)


def _sweep_table(dense, n, cfg, wide):
    """Full pallas sweep (forced contract width) -> assembled moments +
    sorted pair arrays."""
    slab_pass = pallas_block.build_pallas_slab_fn(
        tuple(dense.shape), n, cfg, interpret=True, wide=wide
    )

    def sweep(d):
        (ids, cols, gmin_l, gmax_l, los, his, counts, tags, dovf, povf,
         _nz) = slab_pass(d, 0)
        table, gmin, gmax = blocked._global_moment_combine(
            ids, cols, gmin_l, gmax_l, n
        )
        k1, k2, total, n_runs = blocked._sorted_pair_reduce(
            los, his, tags, counts, 3 * cfg.derived_max_pairs(n), n_labels=n
        )
        return table, gmin, gmax, k1, k2, total, dovf, povf

    table, gmin, gmax, k1, k2, total, dovf, povf = jax.jit(sweep)(dense)
    assert not bool(dovf) and not bool(povf)
    m = pallas_block.assemble_moments_pallas(
        np.asarray(table), np.asarray(gmin), np.asarray(gmax)
    )
    return m, np.asarray(k1), np.asarray(k2), np.asarray(total)


def test_wide_bit_identical_to_narrow():
    img = np.asarray(voronoi_stack((24, 40, 160), 60, seed=3))
    stack = LabeledStack.from_array(img, background=1)
    dense = jnp.asarray(np.asarray(stack.dense))
    n = stack.n_labels
    cfg = PallasConfig()
    narrow = _sweep_table(dense, n, cfg, wide=False)
    wide = _sweep_table(dense, n, cfg, wide=True)
    assert narrow[0]["s2"].shape == wide[0]["s2"].shape
    for key in ("count", "s1", "s2", "cmin", "cmax"):
        np.testing.assert_array_equal(narrow[0][key], wide[0][key], err_msg=key)
    for a, b, name in zip(narrow[1:], wide[1:], ("k1", "k2", "total")):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_reconstruct_rows_wide_oracle():
    """v1 XLA reconstruction at offsets near the 46k bound vs int64."""
    rng = np.random.default_rng(0)
    B, L = 4, 8
    bz, by, bx = 8, 16, 128
    K = bz * by * bx
    # synthetic but range-correct local features (any (lo, hi) split with
    # lo + (hi << _WSHIFT) == f is a valid input)
    C = rng.integers(0, K + 1, size=(B, L)).astype(np.int64)
    s1 = {d: C * (dim - 1) // rng.integers(1, 4, size=(B, L))
          for d, dim in enumerate((bz, by, bx))}
    s2 = {}
    for (i, j) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
        cap = C * (((bz, by, bx)[i] - 1) * ((bz, by, bx)[j] - 1))
        s2[(i, j)] = cap // rng.integers(1, 4, size=(B, L))
    feats = [C, s1[0], s2[(0, 0)], s1[1], s2[(1, 1)], s2[(0, 1)],
             s1[2], s2[(2, 2)], s2[(0, 2)], s2[(1, 2)]]
    mom_local = np.zeros((B, L, 20), np.int32)
    for fi, f in enumerate(feats):
        mom_local[..., 2 * fi] = f & ((1 << pallas_block._WSHIFT) - 1)
        mom_local[..., 2 * fi + 1] = f >> pallas_block._WSHIFT
    # offsets near the wide bound in every axis (multiples of the block)
    offs = np.stack([
        rng.integers(0, 46000 // b, size=B) * b for b in (bz, by, bx)
    ], axis=1).astype(np.int32)
    bbmin = np.zeros((B, L, 3), np.int32)
    bbmax = np.zeros((B, L, 3), np.int32)

    cols, _, _ = pallas_block._reconstruct_rows(
        jnp.asarray(mom_local), jnp.asarray(bbmin), jnp.asarray(bbmax),
        jnp.asarray(offs), wide=True,
    )
    split = np.asarray(blocked._split_rows(cols), dtype=np.int64)
    # single-row "segments": assemble straight from the split rows
    m = pallas_block.assemble_moments_pallas(
        split.reshape(B * L, -1),
        np.zeros((B * L, 3), np.int64),
        np.zeros((B * L, 3), np.int64),
    )
    o = offs.astype(np.int64)
    np.testing.assert_array_equal(m["count"], C.reshape(-1))
    for d in range(3):
        want = (s1[d] + C * o[:, d][:, None]).reshape(-1)
        np.testing.assert_array_equal(m["s1"][:, d], want, err_msg=f"s1[{d}]")
    for col, (i, j) in enumerate(
        ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    ):
        oi, oj = o[:, i][:, None], o[:, j][:, None]
        want = (
            s2[(i, j)] + oi * s1[j] + oj * s1[i] + C * oi * oj
        ).reshape(-1)
        np.testing.assert_array_equal(m["s2"][:, col], want, err_msg=f"{i}{j}")


def test_kernel_v2_wide_large_z_offset_oracle():
    """The in-kernel wide path at a 40,000-voxel traced z offset (the
    sharded z-slab usage) vs a direct int64 oracle."""
    img = np.asarray(voronoi_stack((16, 16, 128), 12, seed=5))
    stack = LabeledStack.from_array(img, background=1)
    dense = jnp.asarray(np.asarray(stack.dense))
    n = stack.n_labels
    cfg = PallasConfig()
    z_off = 40000
    slab_pass = pallas_block.build_pallas_slab_fn(
        tuple(dense.shape), n, cfg, interpret=True, wide=True
    )

    def sweep(d):
        (ids, cols, gmin_l, gmax_l, *_rest) = slab_pass(d, z_off)
        return blocked._global_moment_combine(ids, cols, gmin_l, gmax_l, n)

    table, gmin, gmax = jax.jit(sweep)(dense)
    m = pallas_block.assemble_moments_pallas(
        np.asarray(table), np.asarray(gmin), np.asarray(gmax)
    )

    lab = np.asarray(stack.dense).astype(np.int64)
    zz, yy, xx = np.meshgrid(
        np.arange(lab.shape[0], dtype=np.int64) + z_off,
        np.arange(lab.shape[1], dtype=np.int64),
        np.arange(lab.shape[2], dtype=np.int64),
        indexing="ij",
    )
    for lbl in range(n):
        sel = lab == lbl
        np.testing.assert_array_equal(m["count"][lbl], sel.sum())
        for d, cc in enumerate((zz, yy, xx)):
            np.testing.assert_array_equal(m["s1"][lbl, d], cc[sel].sum())
        for col, (ci, cj) in enumerate(
            ((zz, zz), (zz, yy), (zz, xx), (yy, yy), (yy, xx), (xx, xx))
        ):
            np.testing.assert_array_equal(
                m["s2"][lbl, col], (ci[sel] * cj[sel]).sum()
            )
        np.testing.assert_array_equal(
            m["cmin"][lbl, 0], zz[sel].min() if sel.any() else 0
        )
