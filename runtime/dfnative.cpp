// dfnative — native host-side data-plane kernels for densefusion_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library owns the host-side
// per-sample hot loop (the role CUDA/C served in the reference's data+kernel
// plane): mask pixel selection, depth back-projection, fused image
// normalize+resize, and choose-index remapping. Called from Python via
// ctypes on raw numpy buffers (zero-copy); the loader thread pool scales on
// few-core hosts where the pure-numpy path would starve the TPU.
//
// Build: see runtime/Makefile (g++ -O3 -fPIC -shared).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// splitmix64 — deterministic, seedable RNG for subsampling
// ---------------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t* s) {
    uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

// Collect flat indices of nonzero mask pixels; uniformly subsample without
// replacement to num_points (sorted), or wrap-pad when fewer. Returns the
// number of true mask pixels found (0 => caller emits an invalid sample).
int64_t df_choose_pixels(const uint8_t* mask, int64_t n, int64_t num_points,
                         uint64_t seed, int64_t* out) {
    // first pass: count
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) count += (mask[i] != 0);
    if (count == 0) return 0;

    if (count <= num_points) {
        int64_t k = 0;
        for (int64_t i = 0; i < n && k < count; ++i)
            if (mask[i]) out[k++] = i;
        for (int64_t i = count; i < num_points; ++i)
            out[i] = out[i % count];  // wrap-pad (datasets/ycb/dataset.py:184)
        return count;
    }
    // reservoir sample num_points of count indices, then sort
    uint64_t s = seed ? seed : 0x1234567ULL;
    int64_t seen = 0;
    for (int64_t i = 0; i < n; ++i) {
        if (!mask[i]) continue;
        if (seen < num_points) {
            out[seen] = i;
        } else {
            uint64_t j = splitmix64(&s) % (uint64_t)(seen + 1);
            if ((int64_t)j < num_points) out[j] = i;
        }
        ++seen;
    }
    std::sort(out, out + num_points);
    return count;
}

// Pinhole back-projection of selected pixels. depth is float32 raw units;
// rows/cols absolute pixel coords; out (n, 3) xyz in meters.
void df_backproject(const float* depth, const int64_t* rows,
                    const int64_t* cols, int64_t n, float fx, float fy,
                    float cx, float cy, float depth_scale, float unit_scale,
                    float* out) {
    const float inv_fx = 1.0f / fx, inv_fy = 1.0f / fy;
    const float inv_ds = 1.0f / depth_scale;
    for (int64_t i = 0; i < n; ++i) {
        float z = depth[i] * inv_ds;
        out[3 * i + 0] = ((float)cols[i] - cx) * z * inv_fx * unit_scale;
        out[3 * i + 1] = ((float)rows[i] - cy) * z * inv_fy * unit_scale;
        out[3 * i + 2] = z * unit_scale;
    }
}

// Fused uint8 crop -> ImageNet-normalized, bilinearly-resized float32.
// src: (h, w, 3) uint8; dst: (oh, ow, 3) f32. Half-pixel convention matching
// data/augment.py:resize_bilinear_np. mean/std are the RAW-0-255 reference
// normalization constants (SURVEY.md §2.4).
void df_normalize_resize(const uint8_t* src, int64_t h, int64_t w,
                         float* dst, int64_t oh, int64_t ow,
                         const float* mean, const float* stdv) {
    const float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};
    for (int64_t oy = 0; oy < oh; ++oy) {
        float fy = ((float)oy + 0.5f) * (float)h / (float)oh - 0.5f;
        fy = std::min(std::max(fy, 0.0f), (float)(h - 1));
        int64_t y0 = (int64_t)fy;
        int64_t y1 = std::min(y0 + 1, h - 1);
        float wy = fy - (float)y0;
        for (int64_t ox = 0; ox < ow; ++ox) {
            float fx = ((float)ox + 0.5f) * (float)w / (float)ow - 0.5f;
            fx = std::min(std::max(fx, 0.0f), (float)(w - 1));
            int64_t x0 = (int64_t)fx;
            int64_t x1 = std::min(x0 + 1, w - 1);
            float wx = fx - (float)x0;
            const uint8_t* a = src + 3 * (y0 * w + x0);
            const uint8_t* b = src + 3 * (y0 * w + x1);
            const uint8_t* c = src + 3 * (y1 * w + x0);
            const uint8_t* d = src + 3 * (y1 * w + x1);
            float* o = dst + 3 * (oy * ow + ox);
            for (int ch = 0; ch < 3; ++ch) {
                float v = (float)a[ch] * (1 - wy) * (1 - wx)
                        + (float)b[ch] * (1 - wy) * wx
                        + (float)c[ch] * wy * (1 - wx)
                        + (float)d[ch] * wy * wx;
                o[ch] = (v - mean[ch]) * inv_std[ch];
            }
        }
    }
}

// float32 variant (post-augmentation images are float)
void df_normalize_resize_f32(const float* src, int64_t h, int64_t w,
                             float* dst, int64_t oh, int64_t ow,
                             const float* mean, const float* stdv) {
    const float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};
    for (int64_t oy = 0; oy < oh; ++oy) {
        float fy = ((float)oy + 0.5f) * (float)h / (float)oh - 0.5f;
        fy = std::min(std::max(fy, 0.0f), (float)(h - 1));
        int64_t y0 = (int64_t)fy;
        int64_t y1 = std::min(y0 + 1, h - 1);
        float wy = fy - (float)y0;
        for (int64_t ox = 0; ox < ow; ++ox) {
            float fx = ((float)ox + 0.5f) * (float)w / (float)ow - 0.5f;
            fx = std::min(std::max(fx, 0.0f), (float)(w - 1));
            int64_t x0 = (int64_t)fx;
            int64_t x1 = std::min(x0 + 1, w - 1);
            float wx = fx - (float)x0;
            const float* a = src + 3 * (y0 * w + x0);
            const float* b = src + 3 * (y0 * w + x1);
            const float* c = src + 3 * (y1 * w + x0);
            const float* d = src + 3 * (y1 * w + x1);
            float* o = dst + 3 * (oy * ow + ox);
            for (int ch = 0; ch < 3; ++ch) {
                float v = a[ch] * (1 - wy) * (1 - wx) + b[ch] * (1 - wy) * wx
                        + c[ch] * wy * (1 - wx) + d[ch] * wy * wx;
                o[ch] = (v - mean[ch]) * inv_std[ch];
            }
        }
    }
}

// Remap flat choose indices from a (crop_h, crop_w) grid to the nearest
// pixels of the (out_h, out_w) resized grid (geometry/bbox.py semantics).
void df_remap_choose(const int64_t* choose, int64_t n, int64_t crop_h,
                     int64_t crop_w, int64_t out_h, int64_t out_w,
                     int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t r = choose[i] / crop_w;
        int64_t c = choose[i] % crop_w;
        float nr = ((float)r + 0.5f) * (float)out_h / (float)crop_h - 0.5f;
        float nc = ((float)c + 0.5f) * (float)out_w / (float)crop_w - 0.5f;
        int64_t rr = (int64_t)std::lround(std::min(
            std::max(nr, 0.0f), (float)(out_h - 1)));
        int64_t cc = (int64_t)std::lround(std::min(
            std::max(nc, 0.0f), (float)(out_w - 1)));
        out[i] = rr * out_w + cc;
    }
}

int df_version() { return 1; }

}  // extern "C"
