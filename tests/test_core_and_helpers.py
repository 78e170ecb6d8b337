"""SpatialImage / inrimage IO, LabeledStack, module helpers."""

import numpy as np
import pytest

from tissue_analysis_tpu import SpatialImage, imread, imsave
from tissue_analysis_tpu.analysis import (
    dilation,
    dilation_by,
    distance,
    hollow_out_cells,
    sort_boundingbox,
    wall,
)
from tissue_analysis_tpu.core.stack import LabeledStack
from tissue_analysis_tpu.oracle import ScipyOracle


def test_spatial_image_metadata():
    img = SpatialImage(np.zeros((4, 5, 6), np.uint8), voxelsize=(2.0, 1.0, 0.5))
    assert img.voxelsize == (2.0, 1.0, 0.5)
    assert img.resolution == img.voxelsize  # legacy alias
    with pytest.raises(ValueError):
        SpatialImage(np.zeros((4, 4)), voxelsize=(1.0, 1.0, 1.0))


@pytest.mark.parametrize("suffix", [".inr", ".inr.gz", ".npz"])
@pytest.mark.parametrize(
    "dtype", [np.uint8, np.uint16, np.int32, np.float32]
)
def test_image_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 100, size=(5, 6, 7)).astype(dtype)
    img = SpatialImage(arr, voxelsize=(0.5, 1.0, 2.0))
    path = str(tmp_path / f"img{suffix}")
    imsave(path, img)
    back = imread(path)
    np.testing.assert_array_equal(np.asarray(back), arr)
    assert back.voxelsize == (0.5, 1.0, 2.0)
    assert back.dtype == arr.dtype


def test_inr_2d_roundtrip(tmp_path):
    arr = np.arange(20, dtype=np.uint16).reshape(4, 5)
    img = SpatialImage(arr, voxelsize=(0.25, 0.75))
    path = str(tmp_path / "img2d.inr")
    imsave(path, img)
    back = imread(path)
    assert back.ndim == 2
    np.testing.assert_array_equal(np.asarray(back), arr)
    assert back.voxelsize == (0.25, 0.75)


def test_labeled_stack_background_pinned(gapped):
    st = LabeledStack.from_array(gapped, background=1)
    assert st.background_segment == 0
    assert st.background_id == 1
    assert st.segment_of(1) == 0
    # all original ids recoverable
    assert set(st.ids) == set(np.unique(np.asarray(gapped)))
    # dense image relabels back exactly
    dense = np.asarray(st.dense)
    np.testing.assert_array_equal(st.ids[dense], np.asarray(gapped))


def test_labeled_stack_absent_background(cube):
    st = LabeledStack.from_array(cube, background=7777)
    assert st.background_segment is None and st.background_id is None


def test_dilation_helpers():
    sl = (slice(2, 5), slice(0, 3))
    assert dilation(sl) == (slice(1, 6), slice(0, 4))
    assert dilation_by(sl, 2, shape=(6, 4)) == (slice(0, 6), slice(0, 4))


def test_distance():
    assert distance((0, 0, 0), (3, 4, 0)) == 5.0


def test_sort_boundingbox(small3d):
    o = ScipyOracle(small3d, background=1)
    bbs = o.boundingbox()
    order = sort_boundingbox(bbs)
    sizes = [
        np.prod([s.stop - s.start for s in bbs[l]]) if bbs[l] else -1
        for l in order
    ]
    assert sizes == sorted(sizes, reverse=True)


def test_hollow_out_cells(small3d):
    img = np.asarray(small3d)
    hollow = np.asarray(hollow_out_cells(small3d, background=1))
    assert hollow.shape == img.shape
    # walls keep their original label; interiors are background
    changed = hollow != img
    assert np.all(hollow[changed] == 1)
    # every 6-interior voxel was hollowed
    interior = np.ones(img.shape, bool)
    for d in range(3):
        a = [slice(None)] * 3
        b = [slice(None)] * 3
        a[d], b[d] = slice(0, -1), slice(1, None)
        same = img[tuple(a)] == img[tuple(b)]
        pad_hi = [(0, 0)] * 3
        pad_lo = [(0, 0)] * 3
        pad_hi[d], pad_lo[d] = (1, 0), (0, 1)
        interior &= np.pad(same, pad_lo, constant_values=False)
        interior &= np.pad(same, pad_hi, constant_values=False)
    np.testing.assert_array_equal(hollow[interior], np.full(interior.sum(), 1))
    np.testing.assert_array_equal(hollow[~interior], img[~interior])


def test_wall_mask(cube):
    img = np.asarray(cube)
    m = wall(img, 5)
    assert m.dtype == bool
    inside = img == 5
    assert m.sum() > 0
    assert np.all(inside[m])
    # wall voxels have at least one neighbor that is not the label
    from scipy import ndimage as nd

    eroded = nd.binary_erosion(inside)
    np.testing.assert_array_equal(m, inside & ~eroded)


def test_misc_utilities(tmp_path):
    import numpy as np
    from tissue_analysis_tpu.analysis.misc import (
        labels_in_image, load_labels, relabel_image, remove_cells, save_labels,
    )
    from tissue_analysis_tpu.core.spatial_image import SpatialImage

    img = SpatialImage(
        np.array([[1, 2, 2], [3, 3, 9]], dtype=np.uint8), voxelsize=(0.5, 2.0)
    )
    assert labels_in_image(img) == [1, 2, 3, 9]
    assert labels_in_image(img, exclude=[1]) == [2, 3, 9]

    p = str(tmp_path / "labels.txt")
    save_labels([3, 9], p)
    assert load_labels(p) == [3, 9]

    r = relabel_image(img, {2: 7, 9: 2})
    assert labels_in_image(r) == [1, 2, 3, 7]
    assert r.voxelsize == (0.5, 2.0)
    r2 = relabel_image(img, {2: 7}, default=0)
    assert labels_in_image(r2) == [0, 7]

    rm = remove_cells(img, [2, 9], background=1)
    assert labels_in_image(rm) == [1, 3]


def test_vectorial_inr_roundtrip(tmp_path):
    """VDIM>1 multichannel .inr round-trip (trailing channel axis)."""
    import numpy as np

    from tissue_analysis_tpu.core.spatial_image import imread, imsave, SpatialImage

    rng = np.random.default_rng(0)
    img = SpatialImage(
        rng.integers(0, 4000, size=(5, 6, 7, 3)).astype(np.uint16),
        voxelsize=(2.0, 0.5, 0.5, 1.0),
    )
    path = str(tmp_path / "vec.inr.gz")
    imsave(path, img)
    back = imread(path)
    assert back.shape == (5, 6, 7, 3)
    assert back.voxelsize == (2.0, 0.5, 0.5, 1.0)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))
