// ganpipe — native data-pipeline kernels for gan_lib_tensorflow_tpu.
//
// The reference is pure Python (SURVEY.md §2: no native components); this is
// the framework's native tier where the host pipeline is hot: fused
// gather+normalize batch assembly (one pass over uint8 instead of numpy's
// float32 materialize-then-scale), box downsampling for the PGGAN resolution
// ladder, and crop/flip jitter for paired images. Single-threaded + SIMD
// (this host exposes one core); compiled -O3 -march=native.
//
// ABI: plain C functions over caller-allocated buffers (ctypes-friendly).

#include <cstdint>
#include <cstring>

extern "C" {

// Assemble a training batch from a uint8 image store:
// dst[b] = store[idx[b]] / 127.5 - 1.0  (NHWC, contiguous)
void gather_normalize_u8(const uint8_t* store, const int64_t* idx,
                         int64_t batch, int64_t img_elems, float* dst) {
    for (int64_t b = 0; b < batch; ++b) {
        const uint8_t* src = store + idx[b] * img_elems;
        float* out = dst + b * img_elems;
        for (int64_t i = 0; i < img_elems; ++i) {
            out[i] = src[i] * (1.0f / 127.5f) - 1.0f;
        }
    }
}

// Box-filter downsample NHWC float32 by integer factor (PGGAN multires).
void box_downsample_f32(const float* src, int64_t n, int64_t h, int64_t w,
                        int64_t c, int64_t f, float* dst) {
    const int64_t oh = h / f, ow = w / f;
    const float inv = 1.0f / (float)(f * f);
    for (int64_t b = 0; b < n; ++b) {
        const float* im = src + b * h * w * c;
        float* out = dst + b * oh * ow * c;
        for (int64_t y = 0; y < oh; ++y) {
            for (int64_t x = 0; x < ow; ++x) {
                float* o = out + (y * ow + x) * c;
                for (int64_t ch = 0; ch < c; ++ch) o[ch] = 0.0f;
                for (int64_t dy = 0; dy < f; ++dy) {
                    const float* row = im + ((y * f + dy) * w + x * f) * c;
                    for (int64_t dx = 0; dx < f; ++dx) {
                        for (int64_t ch = 0; ch < c; ++ch) {
                            o[ch] += row[dx * c + ch];
                        }
                    }
                }
                for (int64_t ch = 0; ch < c; ++ch) o[ch] *= inv;
            }
        }
    }
}

// Paired-image jitter: crop a (crop x crop) window at (oy, ox) from an
// (h x w x c) uint8 image, optional horizontal flip, normalize to [-1, 1].
void crop_flip_normalize_u8(const uint8_t* src, int64_t h, int64_t w,
                            int64_t c, int64_t oy, int64_t ox, int64_t crop,
                            int flip, float* dst) {
    (void)h;
    for (int64_t y = 0; y < crop; ++y) {
        const uint8_t* row = src + ((oy + y) * w + ox) * c;
        float* out = dst + y * crop * c;
        if (!flip) {
            for (int64_t i = 0; i < crop * c; ++i) {
                out[i] = row[i] * (1.0f / 127.5f) - 1.0f;
            }
        } else {
            for (int64_t x = 0; x < crop; ++x) {
                const uint8_t* px = row + (crop - 1 - x) * c;
                float* opx = out + x * c;
                for (int64_t ch = 0; ch < c; ++ch) {
                    opx[ch] = px[ch] * (1.0f / 127.5f) - 1.0f;
                }
            }
        }
    }
}

// uint8 nearest resize (used before jitter when scale_size != source size).
void resize_nearest_u8(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                       int64_t oh, int64_t ow, uint8_t* dst) {
    for (int64_t y = 0; y < oh; ++y) {
        const int64_t sy = y * h / oh;
        for (int64_t x = 0; x < ow; ++x) {
            const int64_t sx = x * w / ow;
            const uint8_t* px = src + (sy * w + sx) * c;
            uint8_t* opx = dst + (y * ow + x) * c;
            for (int64_t ch = 0; ch < c; ++ch) opx[ch] = px[ch];
        }
    }
}

}  // extern "C"
