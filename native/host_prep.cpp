// pggan_tpu native host-side data preparation.
//
// The reference delegated its data hot path to torch's native DataLoader
// machinery (16 forked workers, train.py:140-142); this framework's host
// runtime equivalent is this small C++ library, driving the per-batch image
// preparation that sits between the uint8 pyramid in RAM and the float32
// NHWC batch handed to the device:
//
//   - box_downsample_u8: exact block-mean downsample (the pyramid builder,
//     semantics of reference dataset.py:244-251),
//   - prep_batch_f32: fused alpha-fade blend (2x2 box down+up, reference
//     dataset.py:109-113) + dynamic-range remap (reference utils.py:24-30)
//     producing the final float32 batch in one pass (one read, one write per
//     pixel instead of numpy's several temporaries).
//
// Build: `make -C native` -> build/libpggan_host.so (OpenMP-parallel).
// Python binding: ctypes (pggan_tpu/data/native.py), numpy fallback when the
// library is absent.

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// dst[(h/factor) x (w/factor) x c] = round(block mean of src), clipped 0..255.
void box_downsample_u8(const uint8_t* src, int h, int w, int c, int factor,
                       uint8_t* dst) {
  const int oh = h / factor, ow = w / factor;
  const float inv = 1.0f / static_cast<float>(factor * factor);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int dy = 0; dy < factor; ++dy) {
          const uint8_t* row = src + ((y * factor + dy) * w + x * factor) * c + ch;
          for (int dx = 0; dx < factor; ++dx) acc += row[dx * c];
        }
        // round-half-even to match numpy's np.round exactly
        float v = std::nearbyintf(acc * inv);
        dst[(y * ow + x) * c + ch] =
            static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v)));
      }
    }
  }
}

// Fused fade + dynamic-range remap for a uint8 NHWC batch:
//   blended = alpha * v + (1 - alpha) * mean2x2(v)   (skipped if alpha >= 1)
//   dst     = (blended - min_in) * scale + min_out
// h and w must be even when alpha < 1 (power-of-two resolutions always are).
void prep_batch_f32(const uint8_t* src, int n, int h, int w, int c,
                    float alpha, float min_in, float scale, float min_out,
                    float* dst) {
  const bool fade = alpha < 1.0f;
  const float a = alpha, b = 1.0f - alpha;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    const uint8_t* img = src + static_cast<long>(i) * h * w * c;
    float* out = dst + static_cast<long>(i) * h * w * c;
    if (!fade) {
      const long total = static_cast<long>(h) * w * c;
      for (long k = 0; k < total; ++k)
        out[k] = (static_cast<float>(img[k]) - min_in) * scale + min_out;
      continue;
    }
    for (int y = 0; y < h; y += 2) {
      for (int x = 0; x < w; x += 2) {
        for (int ch = 0; ch < c; ++ch) {
          const long p00 = (static_cast<long>(y) * w + x) * c + ch;
          const long p01 = p00 + c;
          const long p10 = p00 + static_cast<long>(w) * c;
          const long p11 = p10 + c;
          const float t = 0.25f * (static_cast<float>(img[p00]) +
                                   static_cast<float>(img[p01]) +
                                   static_cast<float>(img[p10]) +
                                   static_cast<float>(img[p11]));
          out[p00] = (a * img[p00] + b * t - min_in) * scale + min_out;
          out[p01] = (a * img[p01] + b * t - min_in) * scale + min_out;
          out[p10] = (a * img[p10] + b * t - min_in) * scale + min_out;
          out[p11] = (a * img[p11] + b * t - min_in) * scale + min_out;
        }
      }
    }
  }
}

}  // extern "C"
