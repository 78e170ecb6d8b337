"""Pallas fused-kernel engine vs the XLA blocked engine — bit-identical.

Runs in interpret mode on the CPU backend; the same kernel compiles via
Mosaic on a real TPU (exercised by bench/verify there).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.core.synthetic import (
    single_cube_image,
    two_slab_image,
    voronoi_stack,
)
from tissue_analysis_tpu.engine import (
    analyze_stack_blocked,
    analyze_stack_pallas,
)
from tissue_analysis_tpu.ops.pallas_block import PallasConfig

FIELDS = (
    "count", "s1", "s2", "cmin", "cmax",
    "pair_lo", "pair_hi", "wall_face_counts", "margin",
)


def _cmp(img, background=1, cfg=None, n_bucket=None):
    stack = LabeledStack.from_array(np.asarray(img), background=background)
    a = analyze_stack_pallas(stack, cfg=cfg, n_bucket=n_bucket)
    b = analyze_stack_blocked(stack)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    return a


@pytest.mark.parametrize(
    "shape,ncells,seed",
    [
        ((16, 16, 128), 20, 0),  # exactly block-sized in x
        ((24, 24, 24), 20, 1),  # pad on every axis
        ((32, 48, 130), 60, 2),  # multi-block + x pad
        ((40, 33, 100), 45, 4),  # odd everything
    ],
)
def test_pallas_equals_blocked(shape, ncells, seed):
    _cmp(voronoi_stack(shape, ncells, seed=seed, voxelsize=(2.0, 0.5, 0.5)))


def test_pallas_edge_cases():
    _cmp(single_cube_image())
    _cmp(two_slab_image(), background=None)


def test_pallas_gapped_ids_and_bucket():
    img = np.asarray(voronoi_stack((16, 16, 16), 10, seed=2)).astype(np.int64)
    img[img > 1] += 100
    img[img == 105] = 900
    _cmp(img)
    _cmp(img, n_bucket=128)


def test_pallas_overflow_reruns():
    img = voronoi_stack((24, 24, 48), 40, seed=3)
    cfg = PallasConfig(max_labels_per_block=8, max_pairs_per_block=4, max_pairs=4)
    _cmp(img, cfg=cfg)


def test_pallas_oracle_bitmatch():
    """End-to-end: pallas engine barycenters bit-match the scipy oracle."""
    from tissue_analysis_tpu.oracle.scipy_oracle import ScipyOracle

    img = voronoi_stack((24, 24, 24), 20, seed=5, voxelsize=(2.0, 0.5, 0.5))
    stack = LabeledStack.from_array(
        np.asarray(img), voxelsize=img.voxelsize, background=1
    )
    t = analyze_stack_pallas(stack)
    oracle = ScipyOracle(np.asarray(img), voxelsize=img.voxelsize, background=1)
    bary = t.barycenter(real=True)
    exp = oracle.barycenter(real=True)
    for s, l in enumerate(t.ids):
        assert np.array_equal(bary[s], exp[int(l)]), l


def test_pallas_dense_labels_past_bf16():
    """Labels far beyond 256 through every kernel-v2 patch path.

    Regression for the Mosaic bf16 MXU demotion bug: the kernel's x-patch
    spread matvec ran label VALUES through an f32 dot, which Mosaic lowers
    as single-pass bf16 — values > 256 rounded, producing sparse wrong
    x-neighbors and phantom pairs at 512³/2031 labels. The kernel now
    splits values into two 8-bit parts (bf16-exact under any demotion).
    This fixture forces >256 distinct labels across x-block boundaries so
    the patch path carries large values; interpret mode guards the split
    logic and the TPU bench/oracle flow guards the hardware lowering.
    """
    img = voronoi_stack((64, 64, 256), 2500, seed=11)
    stack = LabeledStack.from_array(np.asarray(img), background=1)
    assert stack.n_labels > 300  # dense ids past the bf16-exact range
    a = analyze_stack_pallas(stack)
    # chunked, not blocked: independent machinery, and no L·L static cap
    # to trip on a 400-label fixture
    from tissue_analysis_tpu.engine import analyze_stack_chunked
    b = analyze_stack_chunked(stack)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_extras_v2_matches_numpy():
    """kernel-v2's compact extras = the three +1 boundary planes per block,
    raw labels with fill n beyond the padded stack (layout contract the
    kernel's in-kernel neighbor construction depends on)."""
    from tissue_analysis_tpu.ops import pallas_block as pb

    block = (8, 16, 128)
    bz, by, bx = block
    img = np.asarray(voronoi_stack((16, 32, 256), 120, seed=9))
    stack = LabeledStack.from_array(img, background=1)
    dense = np.asarray(stack.dense)
    n = stack.n_labels
    ex = np.asarray(pb._extras_v2(jnp.asarray(dense), n, block))
    Z, Y, X = dense.shape
    gz, gy, gx = Z // bz, Y // by, X // bx
    padded = np.full((Z + bz, Y + by, X + bx), n, dense.dtype)
    padded[:Z, :Y, :X] = dense
    for iz in range(gz):
        for iy in range(gy):
            for ix in range(gx):
                b = (iz * gy + iy) * gx + ix
                z0, y0, x0 = iz * bz, iy * by, ix * bx
                assert np.array_equal(
                    ex[b, 0, : by * bx],
                    padded[z0 + bz, y0:y0 + by, x0:x0 + bx].reshape(-1),
                )
                assert np.array_equal(
                    ex[b, 1, : bz * bx].reshape(bz, bx),
                    padded[z0:z0 + bz, y0 + by, x0:x0 + bx],
                )
                xv = ex[b, 1, bz * bx:].reshape(bz, 128)[:, :by]
                assert np.array_equal(
                    xv, padded[z0:z0 + bz, y0:y0 + by, x0 + bx]
                )


@pytest.mark.parametrize("pack", [2, 4])
def test_pallas_pack_bit_identical(pack):
    """kernel-v2 block packing (PallasConfig.pack): P blocks per grid step
    share one dictionary chain and one marginal dot, but every per-block
    computation is unchanged — tables must be bit-identical to P=1 (and to
    the blocked engine), including when the block count is not a multiple
    of P (the group pads with label-n blocks)."""
    img = voronoi_stack((24, 32, 300), 80, seed=7, voxelsize=(1.0, 0.5, 0.25))
    a = _cmp(img, cfg=PallasConfig(pack=pack))
    base = analyze_stack_pallas(
        LabeledStack.from_array(np.asarray(img), background=1),
        cfg=PallasConfig(pack=1),
    )
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(base, f),
                                      err_msg=f)


@pytest.mark.parametrize("dict_rows", [7, 2])
def test_pallas_dict_rows_bit_identical(dict_rows):
    """Two-phase per-x-row dictionary extraction (PallasConfig.dict_rows,
    `_dict_extract_rows`): phase 1 harvests per-x-row min/max candidates,
    phase 2 runs the unchanged serial chain on the candidate array — the
    candidate multiset's distinct-value set equals the block's, and slot
    assignment depends only on that set, so tables must be bit-identical
    to the chain (and the blocked engine). dict_rows=2 additionally
    exercises the phase-1 overflow -> grow_dict retry (rows here hold up
    to ~10 distinct labels > 2*2)."""
    img = voronoi_stack((24, 32, 300), 80, seed=7, voxelsize=(1.0, 0.5, 0.25))
    a = _cmp(img, cfg=PallasConfig(dict_rows=dict_rows))
    base = analyze_stack_pallas(
        LabeledStack.from_array(np.asarray(img), background=1)
    )
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(base, f),
                                      err_msg=f)


def test_pallas_chain_vec_bit_identical():
    """Vectorized band-collapse chain (_dict_extract_vec, A/B flag): same
    extraction order and slot contract as the serial chain, so tables must
    be bit-identical. (Kept as a measured-rejected A/B leg: silicon grid
    87 vs 78 ms gross — per-step cost is op-count-bound, BASELINE.md r4.)"""
    from tissue_analysis_tpu.engine import _GOOD_CFG
    from tissue_analysis_tpu.ops import pallas_block

    img = voronoi_stack((24, 32, 300), 80, seed=7, voxelsize=(1.0, 0.5, 0.25))
    stack = LabeledStack.from_array(np.asarray(img), background=1)
    base = analyze_stack_pallas(stack)
    _GOOD_CFG.clear()
    pallas_block._CHAIN_VEC = True
    try:
        a = analyze_stack_pallas(stack)
    finally:
        pallas_block._CHAIN_VEC = False
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(base, f),
                                      err_msg=f)
