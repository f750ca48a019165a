"""ctypes bindings for the native host data-plane library (runtime/dfnative.cpp).

Auto-builds ``runtime/libdfnative.so`` with g++ on first import if missing;
every entry point has a numpy fallback so the framework degrades gracefully
where no compiler exists. ``data/common.py`` routes back-projection,
fused normalize+resize, and choose-index remap through here;
``choose_pixels`` (reservoir sampling) is an available alternative to the
numpy path but is NOT wired in by default — its RNG stream differs from the
datasets' per-sample generators, which would make sample content depend on
native availability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libdfnative.so")

_lock = threading.Lock()
_lib = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_u16p = ctypes.POINTER(ctypes.c_uint16)


def _build() -> bool:
    src = os.path.join(_RUNTIME_DIR, "dfnative.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o",
             _LIB_PATH, src, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.df_choose_pixels.restype = ctypes.c_int64
        lib.df_choose_pixels.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, _i64p]
        lib.df_backproject.restype = None
        lib.df_backproject.argtypes = [
            _f32p, _i64p, _i64p, ctypes.c_int64] + [ctypes.c_float] * 6 \
            + [_f32p]
        lib.df_normalize_resize.restype = None
        lib.df_normalize_resize.argtypes = [
            _u8p, ctypes.c_int64, ctypes.c_int64, _f32p, ctypes.c_int64,
            ctypes.c_int64, _f32p, _f32p]
        lib.df_normalize_resize_f32.restype = None
        lib.df_normalize_resize_f32.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, _f32p, ctypes.c_int64,
            ctypes.c_int64, _f32p, _f32p]
        lib.df_remap_choose.restype = None
        lib.df_remap_choose.argtypes = [
            _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, _i64p]
        if hasattr(lib, "df_png_info"):   # v2 entry points
            lib.df_png_info.restype = ctypes.c_int
            lib.df_png_info.argtypes = [
                _u8p, ctypes.c_int64, _i64p, _i64p, _i64p, _i64p]
            lib.df_png_decode.restype = ctypes.c_int
            lib.df_png_decode.argtypes = [_u8p, ctypes.c_int64, _u8p]
            lib.df_color_jitter.restype = None
            lib.df_color_jitter.argtypes = [
                _u8p, ctypes.c_int64, ctypes.c_int64, _i32p, ctypes.c_int64,
                _f32p, _f32p]
            lib.df_gaussian_noise.restype = None
            lib.df_gaussian_noise.argtypes = [
                _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_uint64]
        if hasattr(lib, "df_label_hist_bbox"):    # v4 entry points
            lib.df_label_hist_bbox.restype = None
            lib.df_label_hist_bbox.argtypes = [
                _u8p, _u16p, ctypes.c_int64, ctypes.c_int64, _i64p, _i64p]
            lib.df_apply_front_hist_bbox.restype = ctypes.c_int64
            lib.df_apply_front_hist_bbox.argtypes = [
                _u8p, _u8p, _u16p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, _u8p, _u8p, _i64p, _i64p]
            lib.df_object_mask_window.restype = None
            lib.df_object_mask_window.argtypes = [
                _u8p, _u16p] + [ctypes.c_int64] * 6 + [_u8p]
            lib.df_add_scaled.restype = None
            lib.df_add_scaled.argtypes = [
                _f32p, ctypes.c_int64, _f32p, ctypes.c_float]
        if hasattr(lib, "df_label_depth_hist"):   # v3 entry points
            lib.df_label_depth_hist.restype = None
            lib.df_label_depth_hist.argtypes = [
                _u8p, _u16p, ctypes.c_int64, _i64p]
            lib.df_apply_front.restype = ctypes.c_int64
            lib.df_apply_front.argtypes = [
                _u8p, _u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _u8p, _u8p]
            lib.df_object_mask.restype = ctypes.c_int64
            lib.df_object_mask.argtypes = [
                _u8p, _u16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _u8p, _u8p, _i64p]
            lib.df_compose_crop.restype = None
            lib.df_compose_crop.argtypes = [
                _u8p, _u8p, _u8p, _u8p, _u8p, ctypes.c_int64, _u8p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctype)


def choose_pixels(mask: np.ndarray, num_points: int,
                  seed: int) -> np.ndarray | None:
    """Native equivalent of data.common.choose_mask_pixels (subsample differs
    only in RNG stream; both are uniform without replacement)."""
    lib = _load()
    mask_u8 = np.ascontiguousarray(mask.reshape(-1), dtype=np.uint8)
    out = np.empty(num_points, np.int64)
    found = lib.df_choose_pixels(
        _ptr(mask_u8, _u8p), mask_u8.size, num_points,
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), _ptr(out, _i64p))
    if found == 0:
        return None
    return out


def backproject(depth: np.ndarray, rows: np.ndarray, cols: np.ndarray,
                fx: float, fy: float, cx: float, cy: float,
                depth_scale: float, unit_scale: float = 1.0) -> np.ndarray:
    lib = _load()
    d = np.ascontiguousarray(depth, np.float32)
    r = np.ascontiguousarray(rows, np.int64)
    c = np.ascontiguousarray(cols, np.int64)
    out = np.empty((d.size, 3), np.float32)
    lib.df_backproject(_ptr(d, _f32p), _ptr(r, _i64p), _ptr(c, _i64p),
                       d.size, fx, fy, cx, cy, depth_scale, unit_scale,
                       _ptr(out, _f32p))
    return out


def normalize_resize(img: np.ndarray, out_h: int, out_w: int,
                     mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8/float -> normalized resized (out_h, out_w, 3) f32."""
    lib = _load()
    h, w = img.shape[:2]
    out = np.empty((out_h, out_w, 3), np.float32)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    if img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        lib.df_normalize_resize(_ptr(src, _u8p), h, w, _ptr(out, _f32p),
                                out_h, out_w, _ptr(mean32, _f32p),
                                _ptr(std32, _f32p))
    else:
        src = np.ascontiguousarray(img, np.float32)
        lib.df_normalize_resize_f32(_ptr(src, _f32p), h, w, _ptr(out, _f32p),
                                    out_h, out_w, _ptr(mean32, _f32p),
                                    _ptr(std32, _f32p))
    return out


def remap_choose(choose: np.ndarray, crop_h: int, crop_w: int,
                 out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    ch = np.ascontiguousarray(choose, np.int64)
    out = np.empty_like(ch)
    lib.df_remap_choose(_ptr(ch, _i64p), ch.size, crop_h, crop_w, out_h,
                        out_w, _ptr(out, _i64p))
    return out


def decode_supported() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "df_png_decode")


# palette (3) decodes to raw indices, matching np.array(PIL P-mode image)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray | None:
    """Decode a PNG byte string to (h, w[, c]) uint8 — or uint16 for 16-bit
    gray depth maps. Returns None for unsupported formats (caller falls back
    to PIL). Palette images are expanded to RGB (PIL-convert-equivalent)."""
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    depth = ctypes.c_int64()
    ctype = ctypes.c_int64()
    rc = lib.df_png_info(_ptr(buf, _u8p), buf.size, ctypes.byref(w),
                         ctypes.byref(h), ctypes.byref(depth),
                         ctypes.byref(ctype))
    if rc != 0:
        return None
    channels = _PNG_CHANNELS.get(ctype.value)
    if channels is None:
        return None
    if depth.value == 16:
        if ctype.value != 0:
            return None
        out = np.empty((h.value, w.value), np.uint16)
    else:
        shape = (h.value, w.value) if channels == 1 \
            else (h.value, w.value, channels)
        out = np.empty(shape, np.uint8)
    rc = lib.df_png_decode(_ptr(buf, _u8p), buf.size,
                           out.ctypes.data_as(_u8p))
    if rc != 0:
        return None
    return out


def decode_png_file(path: str) -> np.ndarray | None:
    with open(path, "rb") as f:
        return decode_png(f.read())


# op ids for df_color_jitter (order of data/augment.py's ops list)
JITTER_BRIGHTNESS, JITTER_CONTRAST, JITTER_SATURATION, JITTER_HUE = 0, 1, 2, 3


def color_jitter(img: np.ndarray, ops: np.ndarray,
                 factors: np.ndarray) -> np.ndarray:
    """Fused ColorJitter on a (h, w, 3) uint8 crop; ``ops`` is the op-id
    application order, ``factors[op_id]`` the drawn factor (hue: shift)."""
    lib = _load()
    src = np.ascontiguousarray(img, np.uint8)
    h, w = src.shape[:2]
    out = np.empty((h, w, 3), np.float32)
    ops32 = np.ascontiguousarray(ops, np.int32)
    f32 = np.ascontiguousarray(factors, np.float32)
    lib.df_color_jitter(_ptr(src, _u8p), h, w, _ptr(ops32, _i32p), ops32.size,
                        _ptr(f32, _f32p), _ptr(out, _f32p))
    return out


def gaussian_noise(img: np.ndarray, scale: float, seed: int) -> np.ndarray:
    """In-place additive N(0, scale) noise on a float32 array."""
    lib = _load()
    arr = np.ascontiguousarray(img, np.float32)
    lib.df_gaussian_noise(_ptr(arr, _f32p), arr.size,
                          ctypes.c_float(scale),
                          ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return arr


def loader_kernels_supported() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "df_label_depth_hist")


def label_depth_hist(label: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """Per-label-value count of nonzero-depth pixels -> (256,) int64."""
    lib = _load()
    lab = np.ascontiguousarray(label.reshape(-1), np.uint8)
    dep = np.ascontiguousarray(depth.reshape(-1), np.uint16)
    counts = np.empty(256, np.int64)
    lib.df_label_depth_hist(_ptr(lab, _u8p), _ptr(dep, _u16p), lab.size,
                            _ptr(counts, _i64p))
    return counts


def apply_front(label: np.ndarray, f_label: np.ndarray, id0: int, id1: int
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Zero the label under two occluder objects of ``f_label``; returns
    (new_label, front_mask(bool), surviving_count)."""
    lib = _load()
    lab = np.ascontiguousarray(label, np.uint8)
    fl = np.ascontiguousarray(f_label, np.uint8)
    out = np.empty_like(lab)
    front = np.empty(lab.shape, np.uint8)
    count = lib.df_apply_front(_ptr(lab, _u8p), _ptr(fl, _u8p), lab.size,
                               id0, id1, _ptr(out, _u8p), _ptr(front, _u8p))
    return out, front.view(bool), int(count)


def object_mask(label: np.ndarray, depth: np.ndarray, obj_id: int
                ) -> tuple[np.ndarray, np.ndarray, tuple | None, int]:
    """One-pass (label==id) mask, depth-valid mask, tight bbox
    (rmin, rmax_excl, cmin, cmax_excl) and valid-pixel count."""
    lib = _load()
    h, w = label.shape
    lab = np.ascontiguousarray(label, np.uint8)
    dep = np.ascontiguousarray(depth, np.uint16)
    mask_label = np.empty((h, w), np.uint8)
    mask_valid = np.empty((h, w), np.uint8)
    bbox = np.empty(4, np.int64)
    count = lib.df_object_mask(_ptr(lab, _u8p), _ptr(dep, _u16p), h, w,
                               obj_id, _ptr(mask_label, _u8p),
                               _ptr(mask_valid, _u8p), _ptr(bbox, _i64p))
    box = None if bbox[0] < 0 else (int(bbox[0]), int(bbox[1]),
                                    int(bbox[2]), int(bbox[3]))
    return mask_label.view(bool), mask_valid.view(bool), box, int(count)


def fused_scan_supported() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "df_label_hist_bbox")


def _unpack_bboxes(bbox: np.ndarray) -> np.ndarray:
    """(256, 4) int64 per-id (rmin, rmax_excl, cmin, cmax_excl); rows of -1
    mean the id never appears."""
    return bbox.reshape(256, 4)


def label_hist_bbox(label: np.ndarray, depth: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """One pass: per-id depth-valid pixel counts (256,) AND per-id tight
    bboxes (256, 4) of the label image."""
    lib = _load()
    h, w = label.shape
    lab = np.ascontiguousarray(label, np.uint8)
    dep = np.ascontiguousarray(depth, np.uint16)
    counts = np.empty(256, np.int64)
    bbox = np.empty(256 * 4, np.int64)
    lib.df_label_hist_bbox(_ptr(lab, _u8p), _ptr(dep, _u16p), h, w,
                           _ptr(counts, _i64p), _ptr(bbox, _i64p))
    return counts, _unpack_bboxes(bbox)


def apply_front_hist_bbox(label: np.ndarray, f_label: np.ndarray,
                          depth: np.ndarray, id0: int, id1: int
                          ) -> tuple[np.ndarray, np.ndarray, int,
                                     np.ndarray, np.ndarray]:
    """apply_front + label_hist_bbox fused into one frame pass: returns
    (new_label, front_mask(bool), surviving_count, counts, bboxes)."""
    lib = _load()
    h, w = label.shape
    lab = np.ascontiguousarray(label, np.uint8)
    fl = np.ascontiguousarray(f_label, np.uint8)
    dep = np.ascontiguousarray(depth, np.uint16)
    out = np.empty_like(lab)
    front = np.empty(lab.shape, np.uint8)
    counts = np.empty(256, np.int64)
    bbox = np.empty(256 * 4, np.int64)
    count = lib.df_apply_front_hist_bbox(
        _ptr(lab, _u8p), _ptr(fl, _u8p), _ptr(dep, _u16p), h, w, id0, id1,
        _ptr(out, _u8p), _ptr(front, _u8p), _ptr(counts, _i64p),
        _ptr(bbox, _i64p))
    return out, front.view(bool), int(count), counts, _unpack_bboxes(bbox)


def object_mask_window(label: np.ndarray, depth: np.ndarray, obj_id: int,
                       r0: int, r1: int, c0: int, c1: int) -> np.ndarray:
    """Depth-valid (label == id) mask of the [r0:r1, c0:c1] window only."""
    lib = _load()
    lab = np.ascontiguousarray(label, np.uint8)
    dep = np.ascontiguousarray(depth, np.uint16)
    out = np.empty((r1 - r0, c1 - c0), np.uint8)
    lib.df_object_mask_window(_ptr(lab, _u8p), _ptr(dep, _u16p),
                              label.shape[1], r0, r1, c0, c1, obj_id,
                              _ptr(out, _u8p))
    return out.view(bool)


def add_scaled(img: np.ndarray, pool: np.ndarray, scale: float) -> np.ndarray:
    """In-place img += scale * pool[:img.size] on float32 buffers (the
    noise-pool fast path; pool must be a contiguous f32 view >= img.size)."""
    lib = _load()
    lib.df_add_scaled(_ptr(img, _f32p), img.size, _ptr(pool, _f32p),
                      ctypes.c_float(scale))
    return img


def compose_crop(rgb: np.ndarray, back: np.ndarray | None,
                 label: np.ndarray | None, front: np.ndarray | None,
                 front_mask: np.ndarray | None) -> np.ndarray:
    """Fused window compositing: back behind label==0, front where
    front_mask==0. All inputs are (h, w, 3)/(h, w) uint8 crop windows."""
    lib = _load()
    src = np.ascontiguousarray(rgb, np.uint8)
    n = src.shape[0] * src.shape[1]
    out = np.empty_like(src)

    def u8(arr):
        if arr is None:
            return ctypes.cast(None, _u8p)
        return _ptr(np.ascontiguousarray(arr, np.uint8), _u8p)

    # keep contiguous copies alive through the call
    back_c = None if back is None else np.ascontiguousarray(back, np.uint8)
    label_c = None if label is None else np.ascontiguousarray(label, np.uint8)
    front_c = None if front is None else np.ascontiguousarray(front, np.uint8)
    fm_c = None if front_mask is None else np.ascontiguousarray(
        front_mask, np.uint8)
    lib.df_compose_crop(_ptr(src, _u8p), u8(back_c), u8(label_c), u8(front_c),
                        u8(fm_c), n, _ptr(out, _u8p))
    return out
