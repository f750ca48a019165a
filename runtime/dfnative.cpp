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
#include <vector>

#include <zlib.h>

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

// ---------------------------------------------------------------------------
// PNG decoder (zlib inflate + scanline unfilter). Covers the dataset formats:
// 8-bit gray / RGB / RGBA / palette and 16-bit gray (depth maps), not
// interlaced. Replaces PIL in the loader hot path (the reference loads every
// frame with PIL, datasets/ycb/dataset.py:94-101); returns <0 so Python can
// fall back to PIL on anything unsupported.
// ---------------------------------------------------------------------------

static inline uint32_t be32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

// Parse IHDR only: fills w, h, bit_depth, color_type. Returns 0 or <0.
int df_png_info(const uint8_t* data, int64_t size, int64_t* w, int64_t* h,
                int64_t* bit_depth, int64_t* color_type) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 33 || std::memcmp(data, sig, 8) != 0) return -1;
    if (std::memcmp(data + 12, "IHDR", 4) != 0) return -2;
    *w = be32(data + 16);
    *h = be32(data + 20);
    *bit_depth = data[24];
    *color_type = data[25];
    if (data[28] != 0) return -3;  // interlaced: unsupported
    return 0;
}

static inline int paeth(int a, int b, int c) {
    int p = a + b - c, pa = std::abs(p - a), pb = std::abs(p - b),
        pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    return (pb <= pc) ? b : c;
}

// Decode into out (row-major, native byte order for 16-bit). out must hold
// h*w*channels samples where channels = 3 for palette (expanded), else the
// color type's channel count. Returns 0 on success.
int df_png_decode(const uint8_t* data, int64_t size, uint8_t* out) {
    int64_t w, h, depth, ctype;
    int rc = df_png_info(data, size, &w, &h, &depth, &ctype);
    if (rc != 0) return rc;
    int channels;
    switch (ctype) {
        case 0: channels = 1; break;   // gray
        case 2: channels = 3; break;   // rgb
        case 3: channels = 1; break;   // palette: raw indices (PIL P-mode
                                       // np.array parity — no expansion)
        case 4: channels = 2; break;   // gray + alpha
        case 6: channels = 4; break;   // rgba
        default: return -4;
    }
    if (depth != 8 && !(depth == 16 && ctype == 0)) return -5;
    const int bpp = channels * (depth / 8);      // filter byte distance
    const int64_t stride = (int64_t)w * bpp;     // bytes per scanline

    // gather IDAT
    std::vector<const uint8_t*> idat;
    std::vector<int64_t> idat_len;
    int64_t pos = 8;
    while (pos + 12 <= size) {
        uint32_t len = be32(data + pos);
        const uint8_t* type = data + pos + 4;
        const uint8_t* body = data + pos + 8;
        if ((int64_t)(pos + 12 + len) > size) return -6;
        if (!std::memcmp(type, "IDAT", 4)) {
            idat.push_back(body);
            idat_len.push_back(len);
        } else if (!std::memcmp(type, "IEND", 4)) {
            break;
        }
        pos += 12 + len;
    }
    if (idat.empty()) return -7;

    // inflate the filtered image
    std::vector<uint8_t> raw((size_t)h * (stride + 1));
    z_stream zs{};
    if (inflateInit(&zs) != Z_OK) return -9;
    zs.next_out = raw.data();
    zs.avail_out = (uInt)raw.size();
    int zrc = Z_OK;
    for (size_t i = 0; i < idat.size() && zrc != Z_STREAM_END; ++i) {
        zs.next_in = const_cast<uint8_t*>(idat[i]);
        zs.avail_in = (uInt)idat_len[i];
        zrc = inflate(&zs, Z_NO_FLUSH);
        if (zrc != Z_OK && zrc != Z_STREAM_END) { inflateEnd(&zs); return -10; }
    }
    bool complete = (zs.total_out == raw.size());
    inflateEnd(&zs);
    if (!complete) return -11;

    // unfilter scanlines in place (into a defiltered buffer)
    std::vector<uint8_t> img((size_t)h * stride);
    const uint8_t* prev = nullptr;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* src = raw.data() + (size_t)y * (stride + 1);
        uint8_t* dst = img.data() + (size_t)y * stride;
        const uint8_t filter = src[0];
        ++src;
        switch (filter) {
            case 0:
                std::memcpy(dst, src, stride);
                break;
            case 1:  // Sub
                for (int64_t i = 0; i < stride; ++i)
                    dst[i] = src[i] + (i >= bpp ? dst[i - bpp] : 0);
                break;
            case 2:  // Up
                for (int64_t i = 0; i < stride; ++i)
                    dst[i] = src[i] + (prev ? prev[i] : 0);
                break;
            case 3:  // Average
                for (int64_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? dst[i - bpp] : 0;
                    int b = prev ? prev[i] : 0;
                    dst[i] = src[i] + (uint8_t)((a + b) >> 1);
                }
                break;
            case 4:  // Paeth
                for (int64_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? dst[i - bpp] : 0;
                    int b = prev ? prev[i] : 0;
                    int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
                    dst[i] = src[i] + (uint8_t)paeth(a, b, c);
                }
                break;
            default:
                return -12;
        }
        prev = dst;
    }

    if (depth == 16) {  // big-endian -> native u16
        uint16_t* o16 = reinterpret_cast<uint16_t*>(out);
        for (int64_t i = 0; i < (int64_t)w * h; ++i)
            o16[i] = (uint16_t)((img[2 * i] << 8) | img[2 * i + 1]);
    } else {
        std::memcpy(out, img.data(), img.size());
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Fused ColorJitter (torchvision semantics; data/augment.py:color_jitter).
// ops: sequence of {0: brightness, 1: contrast, 2: saturation, 3: hue};
// factors indexed by op id (hue factor is the shift in [-0.05, 0.05]).
// src uint8 (h, w, 3) -> dst float32 (h, w, 3), clipped to [0, 255].
// ---------------------------------------------------------------------------
void df_color_jitter(const uint8_t* src, int64_t h, int64_t w,
                     const int32_t* ops, int64_t n_ops,
                     const float* factors, float* dst) {
    const int64_t n = h * w;
    for (int64_t i = 0; i < 3 * n; ++i) dst[i] = (float)src[i];
    for (int64_t k = 0; k < n_ops; ++k) {
        const float f = factors[ops[k]];
        switch (ops[k]) {
            case 0:  // brightness
                for (int64_t i = 0; i < 3 * n; ++i) dst[i] *= f;
                break;
            case 1: {  // contrast: blend with mean gray of current state
                double acc = 0.0;
                for (int64_t i = 0; i < n; ++i)
                    acc += 0.299f * dst[3 * i] + 0.587f * dst[3 * i + 1] +
                           0.114f * dst[3 * i + 2];
                const float g = (float)(acc / (double)n);
                const float add = g * (1.0f - f);
                for (int64_t i = 0; i < 3 * n; ++i)
                    dst[i] = dst[i] * f + add;
                break;
            }
            case 2:  // saturation: blend with per-pixel gray
                for (int64_t i = 0; i < n; ++i) {
                    float g = 0.299f * dst[3 * i] + 0.587f * dst[3 * i + 1] +
                              0.114f * dst[3 * i + 2];
                    const float add = g * (1.0f - f);
                    dst[3 * i] = dst[3 * i] * f + add;
                    dst[3 * i + 1] = dst[3 * i + 1] * f + add;
                    dst[3 * i + 2] = dst[3 * i + 2] * f + add;
                }
                break;
            case 3:  // hue: HSV round-trip with shifted hue
                for (int64_t i = 0; i < n; ++i) {
                    float r = dst[3 * i] * (1.0f / 255.0f);
                    float g = dst[3 * i + 1] * (1.0f / 255.0f);
                    float b = dst[3 * i + 2] * (1.0f / 255.0f);
                    float maxc = std::max(r, std::max(g, b));
                    float minc = std::min(r, std::min(g, b));
                    float delta = maxc - minc;
                    float s = maxc > 0.0f
                        ? delta / std::max(maxc, 1e-12f) : 0.0f;
                    float dd = std::max(delta, 1e-12f);
                    float hh;
                    if (maxc == r) hh = std::fmod((g - b) / dd + 6.0f, 6.0f);
                    else if (maxc == g) hh = (b - r) / dd + 2.0f;
                    else hh = (r - g) / dd + 4.0f;
                    if (delta == 0.0f) hh = 0.0f;
                    hh = hh * (1.0f / 6.0f) + f;
                    hh = hh - std::floor(hh);        // mod 1
                    float v = maxc;
                    float i6 = std::floor(hh * 6.0f);
                    float fr = hh * 6.0f - i6;
                    float p = v * (1.0f - s);
                    float q = v * (1.0f - s * fr);
                    float t = v * (1.0f - s * (1.0f - fr));
                    int ii = ((int)i6) % 6;
                    float ro, go, bo;
                    switch (ii) {
                        case 0: ro = v; go = t; bo = p; break;
                        case 1: ro = q; go = v; bo = p; break;
                        case 2: ro = p; go = v; bo = t; break;
                        case 3: ro = p; go = q; bo = v; break;
                        case 4: ro = t; go = p; bo = v; break;
                        default: ro = v; go = p; bo = q; break;
                    }
                    dst[3 * i] = ro * 255.0f;
                    dst[3 * i + 1] = go * 255.0f;
                    dst[3 * i + 2] = bo * 255.0f;
                }
                break;
        }
    }
    for (int64_t i = 0; i < 3 * n; ++i)
        dst[i] = std::min(std::max(dst[i], 0.0f), 255.0f);
}

// Additive gaussian pixel noise via Box-Muller on splitmix64 — the synthetic-
// frame augmentation (datasets/ycb/dataset.py:166-167) applied crop-only.
void df_gaussian_noise(float* img, int64_t n, float scale, uint64_t seed) {
    uint64_t s = seed ? seed : 0xdeadbeefULL;
    const float TWO_PI = 6.28318530717958647692f;
    for (int64_t i = 0; i < n; i += 2) {
        float u1 = (float)((splitmix64(&s) >> 11) * (1.0 / 9007199254740992.0));
        float u2 = (float)((splitmix64(&s) >> 11) * (1.0 / 9007199254740992.0));
        u1 = std::max(u1, 1e-12f);
        float r = std::sqrt(-2.0f * std::log(u1)) * scale;
        img[i] += r * std::cos(TWO_PI * u2);
        if (i + 1 < n) img[i + 1] += r * std::sin(TWO_PI * u2);
    }
}

// ---------------------------------------------------------------------------
// YCB loader hot-path kernels: everything below runs one C pass over the
// frame so the Python thread pool parallelizes for real (numpy held the GIL
// for most of the per-sample time; docs/PERF.md round 2).
// ---------------------------------------------------------------------------

// Histogram of label values over pixels with nonzero depth (the "enough
// valid pixels" object pick, datasets/ycb/dataset.py:141-147, in one pass).
void df_label_depth_hist(const uint8_t* label, const uint16_t* depth,
                         int64_t n, int64_t* counts /*256*/) {
    std::memset(counts, 0, 256 * sizeof(int64_t));
    for (int64_t i = 0; i < n; ++i)
        if (depth[i] != 0) ++counts[label[i]];
}

// Apply two front-occluder object masks from another frame's label image:
// out_label = label where the occluders are absent, else 0; front_mask = 1
// where NOT occluded. Returns the surviving nonzero-label pixel count
// (datasets/ycb/dataset.py:116-137 semantics).
int64_t df_apply_front(const uint8_t* label, const uint8_t* f_label,
                       int64_t n, int64_t id0, int64_t id1,
                       uint8_t* out_label, uint8_t* front_mask) {
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t fl = f_label[i];
        const bool occluded = (fl == id0) | (fl == id1);
        front_mask[i] = !occluded;
        const uint8_t v = occluded ? 0 : label[i];
        out_label[i] = v;
        count += (v != 0);
    }
    return count;
}

// (label == id) object mask, its depth-valid AND, and the tight bbox of the
// label mask. Returns the depth-valid pixel count; bbox (rmin, rmax_excl,
// cmin, cmax_excl) is -1s when the label never appears.
int64_t df_object_mask(const uint8_t* label, const uint16_t* depth,
                       int64_t h, int64_t w, int64_t obj_id,
                       uint8_t* mask_label, uint8_t* mask_valid,
                       int64_t* bbox) {
    int64_t count = 0;
    int64_t rmin = h, rmax = -1, cmin = w, cmax = -1;
    for (int64_t r = 0; r < h; ++r) {
        const uint8_t* lrow = label + r * w;
        const uint16_t* drow = depth + r * w;
        uint8_t* ml = mask_label + r * w;
        uint8_t* mv = mask_valid + r * w;
        for (int64_t c = 0; c < w; ++c) {
            const bool is_obj = lrow[c] == (uint8_t)obj_id;
            ml[c] = is_obj;
            const bool valid = is_obj & (drow[c] != 0);
            mv[c] = valid;
            count += valid;
            if (is_obj) {
                rmin = std::min(rmin, r);
                rmax = std::max(rmax, r);
                cmin = std::min(cmin, c);
                cmax = std::max(cmax, c);
            }
        }
    }
    if (rmax < 0) {
        bbox[0] = bbox[1] = bbox[2] = bbox[3] = -1;
    } else {
        bbox[0] = rmin; bbox[1] = rmax + 1;
        bbox[2] = cmin; bbox[3] = cmax + 1;
    }
    return count;
}

// Fused crop compositing (datasets/ycb/dataset.py:155-164 restricted to the
// consumed window): out = rgb, with `back` behind label==0 pixels and
// `front` where front_mask==0. Null pointers skip a layer.
void df_compose_crop(const uint8_t* rgb, const uint8_t* back,
                     const uint8_t* label, const uint8_t* front,
                     const uint8_t* front_mask, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = rgb;
        if (back != nullptr && label[i] == 0) src = back;
        if (front != nullptr && front_mask[i] == 0) src = front;
        out[3 * i] = src[3 * i];
        out[3 * i + 1] = src[3 * i + 1];
        out[3 * i + 2] = src[3 * i + 2];
    }
}

int df_version() { return 3; }

}  // extern "C"
