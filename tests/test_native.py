"""Native data-plane library tests: build/load, parity with the numpy
reference implementations, and the assemble_sample fast path."""

import numpy as np
import pytest

from densefusion_tpu import native
from densefusion_tpu.data.schema import IMAGENET_MEAN_255, \
    IMAGENET_STD_255, normalize_image
from densefusion_tpu.data.augment import resize_bilinear_np
from densefusion_tpu.geometry.bbox import remap_choose_to_resized

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable (no g++)")


def test_choose_pixels_subsample(rng):
    mask = np.zeros((40, 40), np.uint8)
    mask[5:30, 5:30] = 1  # 625 pixels
    out = native.choose_pixels(mask, 100, seed=7)
    assert out.shape == (100,)
    assert len(set(out.tolist())) == 100  # without replacement
    flat = np.flatnonzero(mask.reshape(-1))
    assert set(out.tolist()) <= set(flat.tolist())
    assert (np.diff(out) > 0).all()  # sorted
    # deterministic for a fixed seed
    out2 = native.choose_pixels(mask, 100, seed=7)
    np.testing.assert_array_equal(out, out2)
    assert not np.array_equal(out, native.choose_pixels(mask, 100, seed=8))


def test_choose_pixels_wrap_pad():
    mask = np.zeros((10, 10), np.uint8)
    mask[0, :5] = 1
    out = native.choose_pixels(mask, 12, seed=1)
    assert out.shape == (12,)
    np.testing.assert_array_equal(out[:5], np.arange(5))
    np.testing.assert_array_equal(out[5:10], np.arange(5))
    assert native.choose_pixels(np.zeros((4, 4), np.uint8), 8, 0) is None


def test_backproject_matches_numpy(rng):
    n = 200
    depth = rng.uniform(100, 5000, n).astype(np.float32)
    rows = rng.integers(0, 480, n)
    cols = rng.integers(0, 640, n)
    fx, fy, cx, cy, ds = 572.4, 573.5, 325.3, 242.0, 1.0
    out = native.backproject(depth, rows, cols, fx, fy, cx, cy, ds,
                             unit_scale=1e-3)
    z = depth / ds
    want = np.stack([(cols - cx) * z / fx, (rows - cy) * z / fy, z],
                    -1) * 1e-3
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_normalize_resize_matches_numpy_u8(rng):
    img = rng.integers(0, 255, (37, 53, 3)).astype(np.uint8)
    got = native.normalize_resize(img, 24, 24, IMAGENET_MEAN_255,
                                  IMAGENET_STD_255)
    want = resize_bilinear_np(normalize_image(img), 24, 24)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_normalize_resize_matches_numpy_f32(rng):
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    got = native.normalize_resize(img, 32, 48, IMAGENET_MEAN_255,
                                  IMAGENET_STD_255)
    want = resize_bilinear_np(normalize_image(img), 32, 48)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_normalize_resize_identity_size(rng):
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    got = native.normalize_resize(img, 16, 16, IMAGENET_MEAN_255,
                                  IMAGENET_STD_255)
    np.testing.assert_allclose(got, normalize_image(img), atol=1e-4)


def test_remap_choose_matches_numpy():
    choose = np.array([0, 37, 99, 399], np.int64)
    got = native.remap_choose(choose, 20, 20, 8, 8)
    want = remap_choose_to_resized(choose, 20, 20, 8, 8)
    np.testing.assert_array_equal(got, want)


def _png_bytes(arr, mode=None):
    import io
    from PIL import Image
    im = Image.fromarray(arr) if mode is None else Image.fromarray(arr, mode)
    b = io.BytesIO()
    im.save(b, "PNG")
    return b.getvalue()


def test_png_decode_parity_rgb_gray_rgba(rng):
    import io
    from PIL import Image
    for arr in (rng.integers(0, 255, (48, 64, 3)).astype(np.uint8),
                rng.integers(0, 255, (48, 64)).astype(np.uint8),
                rng.integers(0, 255, (20, 16, 4)).astype(np.uint8)):
        data = _png_bytes(arr)
        got = native.decode_png(data)
        want = np.array(Image.open(io.BytesIO(data)))
        assert got is not None
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_png_decode_16bit_depth(rng):
    import io
    from PIL import Image
    depth = rng.integers(0, 65535, (48, 64)).astype(np.uint16)
    im = Image.new("I;16", (64, 48))
    im.frombytes(depth.tobytes())
    b = io.BytesIO()
    im.save(b, "PNG")
    got = native.decode_png(b.getvalue())
    assert got is not None and got.dtype == np.uint16
    np.testing.assert_array_equal(got, depth)


def test_png_decode_palette_matches_pil_indices(rng):
    import io
    from PIL import Image
    label = rng.integers(0, 22, (48, 64)).astype(np.uint8)
    im = Image.fromarray(label).convert("P")
    b = io.BytesIO()
    im.save(b, "PNG")
    got = native.decode_png(b.getvalue())
    want = np.array(Image.open(io.BytesIO(b.getvalue())))
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_png_decode_rejects_garbage():
    assert native.decode_png(b"not a png at all, sorry") is None


def test_color_jitter_native_matches_numpy(rng):
    from densefusion_tpu.data.augment import jitter_params, apply_color_jitter
    img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    ops, factors = jitter_params(rng)
    got = native.color_jitter(img, ops, factors)
    # numpy reference path (force by passing float input)
    want = apply_color_jitter(img.astype(np.float64), (ops, factors))
    np.testing.assert_allclose(got, want, atol=0.35)  # f32 vs f64 HSV paths


def test_color_jitter_all_op_orders(rng):
    """The fused single/two-pass jitter must match the sequential numpy
    reference for EVERY op order — in particular contrast before vs after
    hue (different mean-gray handling) and every pairwise order."""
    import itertools
    from densefusion_tpu.data.augment import apply_color_jitter
    img = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
    factors = np.array([1.15, 0.85, 1.2, 0.04], np.float32)
    for order in itertools.permutations([0, 1, 2, 3]):
        ops = np.asarray(order, np.int32)
        got = native.color_jitter(img, ops, factors)
        want = apply_color_jitter(img.astype(np.float64), (ops, factors))
        np.testing.assert_allclose(got, want, atol=0.35,
                                   err_msg=f"order={order}")
    # subsets (an op can be disabled) and the empty op list
    for ops in ([], [1], [3], [1, 3], [3, 1], [0, 2], [3, 0, 1]):
        ops = np.asarray(ops, np.int32)
        got = native.color_jitter(img, ops, factors)
        want = apply_color_jitter(img.astype(np.float64), (ops, factors))
        np.testing.assert_allclose(got, want, atol=0.35,
                                   err_msg=f"ops={ops}")


@pytest.mark.skipif(not native.fused_scan_supported(),
                    reason="v4 kernels unavailable")
def test_fused_scan_kernels_parity(rng):
    """v4 fused hist+bbox / windowed-mask kernels vs the v3 per-op kernels
    and numpy."""
    h, w = 97, 133
    label = np.zeros((h, w), np.uint8)
    label[10:40, 20:70] = 3
    label[35:80, 60:100] = 7
    label[0, w - 1] = 9      # single-pixel object at a word-tail position
    depth = (rng.integers(0, 3, (h, w)) * 500).astype(np.uint16)
    f_label = np.zeros((h, w), np.uint8)
    f_label[30:60, 40:80] = 2
    f_label[5:15, 5:25] = 4

    counts, bboxes = native.label_hist_bbox(label, depth)
    np.testing.assert_array_equal(
        counts[1:], native.label_depth_hist(label, depth)[1:])
    for i in (3, 7, 9):
        rs, cs = np.nonzero(label == i)
        np.testing.assert_array_equal(
            bboxes[i], (rs.min(), rs.max() + 1, cs.min(), cs.max() + 1))
    assert tuple(bboxes[5]) == (-1, -1, -1, -1)

    out, front, n, counts2, bb2 = native.apply_front_hist_bbox(
        label, f_label, depth, 2, 4)
    o3, f3, n3 = native.apply_front(label, f_label, 2, 4)
    np.testing.assert_array_equal(out, o3)
    np.testing.assert_array_equal(front, f3)
    assert n == n3
    c3, b3 = native.label_hist_bbox(out, depth)
    np.testing.assert_array_equal(counts2, c3)
    np.testing.assert_array_equal(bb2, b3)

    _, mv, _, _ = native.object_mask(label, depth, 7)
    win = native.object_mask_window(label, depth, 7, 30, 85, 55, 105)
    np.testing.assert_array_equal(win, mv[30:85, 55:105])


@pytest.mark.skipif(not native.fused_scan_supported(),
                    reason="v4 kernels unavailable")
def test_add_scaled_and_noise_pool(rng):
    img = rng.uniform(0, 255, 999).astype(np.float32)
    pool = rng.standard_normal(2048).astype(np.float32)
    got = native.add_scaled(img.copy(), pool[7:], 3.0)
    np.testing.assert_allclose(got, img + 3.0 * pool[7:7 + 999], rtol=1e-6)

    from densefusion_tpu.data.augment import gaussian_pixel_noise
    base = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    a = gaussian_pixel_noise(base.copy(), rng, 7.0, seed=1234)
    b = gaussian_pixel_noise(base.copy(), rng, 7.0, seed=1234)
    c = gaussian_pixel_noise(base.copy(), rng, 7.0, seed=99)
    np.testing.assert_array_equal(a, b)   # deterministic in seed
    assert not np.array_equal(a, c)
    resid = (a - base).ravel()
    assert abs(resid.mean()) < 0.5 and 6.0 < resid.std() < 8.0


def test_gaussian_noise_native_deterministic(rng):
    base = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    a = native.gaussian_noise(base.copy(), 7.0, seed=123)
    b = native.gaussian_noise(base.copy(), 7.0, seed=123)
    c = native.gaussian_noise(base.copy(), 7.0, seed=124)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    resid = (a - base).ravel()
    assert abs(resid.mean()) < 0.5
    assert 6.0 < resid.std() < 8.0
