// Native host-side kernels for spr_pick_tpu.
//
// The TPU compute path is JAX/XLA; these C++ kernels serve the *host*
// runtime where the reference burns python time (SURVEY.md §3.5): greedy
// NMS post-processing (reference: python loop over a 1M-element argsort,
// spr_pick/utils/algorithms.py:59-103), micrograph min-max quantisation
// (loader.py:49-59) and Gaussian heatmap rasterisation
// (coordinates.py:39-85).  Exposed via ctypes (see spr_pick_tpu/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libspr_native.so spr_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Greedy non-maximum suppression on an h*w score map.
// Picks maxima in descending score order, suppressing a disk of radius r
// around each pick. Stops at `threshold` (exclusive) or max_out picks.
// out_scores: max_out floats; out_coords: max_out * 2 ints as (x, y).
// Returns the number of picks.
int nms_2d(const float* x, int h, int w, int r, float threshold,
           int max_out, float* out_scores, int* out_coords) {
  const long n = static_cast<long>(h) * w;
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  // Descending stable sort by score.
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return x[a] > x[b]; });

  std::vector<uint8_t> suppressed(n, 0);

  // Precompute disk offsets.
  std::vector<int> dy, dx;
  for (int i = -r; i <= r; ++i)
    for (int j = -r; j <= r; ++j)
      if (i * i + j * j <= r * r) {
        dy.push_back(i);
        dx.push_back(j);
      }

  int count = 0;
  for (long k = 0; k < n && count < max_out; ++k) {
    const int idx = order[k];
    const float val = x[idx];
    if (val <= threshold) break;
    if (suppressed[idx]) continue;
    const int y = idx / w;
    const int xq = idx % w;
    out_scores[count] = val;
    out_coords[2 * count] = xq;
    out_coords[2 * count + 1] = y;
    ++count;
    for (size_t d = 0; d < dy.size(); ++d) {
      const int yy = y + dy[d];
      const int xx = xq + dx[d];
      if (yy >= 0 && yy < h && xx >= 0 && xx < w) suppressed[yy * w + xx] = 1;
    }
  }
  return count;
}

// 3-D greedy NMS (tomograms). coords out as (x, y, z).
int nms_3d(const float* x, int nz, int ny, int nx, float radius,
           float threshold, int max_out, float* out_scores, int* out_coords) {
  const long n = static_cast<long>(nz) * ny * nx;
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return x[a] > x[b]; });

  std::vector<uint8_t> suppressed(n, 0);
  const int width = static_cast<int>(std::ceil(radius));
  std::vector<int> dz, dy, dx;
  for (int i = -width; i <= width; ++i)
    for (int j = -width; j <= width; ++j)
      for (int k = -width; k <= width; ++k)
        if (i * i + j * j + k * k <= radius * radius) {
          dz.push_back(i);
          dy.push_back(j);
          dx.push_back(k);
        }

  int count = 0;
  for (long k = 0; k < n && count < max_out; ++k) {
    const int idx = order[k];
    const float val = x[idx];
    if (val <= threshold) break;
    if (suppressed[idx]) continue;
    const int z = idx / (ny * nx);
    const int rem = idx % (ny * nx);
    const int y = rem / nx;
    const int xq = rem % nx;
    out_scores[count] = val;
    out_coords[3 * count] = xq;
    out_coords[3 * count + 1] = y;
    out_coords[3 * count + 2] = z;
    ++count;
    for (size_t d = 0; d < dz.size(); ++d) {
      const int zz = z + dz[d];
      const int yy = y + dy[d];
      const int xx = xq + dx[d];
      if (zz >= 0 && zz < nz && yy >= 0 && yy < ny && xx >= 0 && xx < nx)
        suppressed[(static_cast<long>(zz) * ny + yy) * nx + xx] = 1;
    }
  }
  return count;
}

// Min-max normalise to [0,1], scale by 255, truncate to uint8
// (exact reference normalisation semantics, loader.py:57-58).
void minmax_quantize_u8(const float* in, long n, uint8_t* out) {
  if (n <= 0) return;
  float lo = in[0], hi = in[0];
  for (long i = 1; i < n; ++i) {
    lo = std::min(lo, in[i]);
    hi = std::max(hi, in[i]);
  }
  if (hi > lo) {
    const float range = hi - lo;
    for (long i = 0; i < n; ++i) {
      // Two-step normalise-then-scale in float32 to match the numpy
      // reference bit-for-bit at truncation boundaries.
      const float norm = (in[i] - lo) / range;
      out[i] = static_cast<uint8_t>(norm * 255.0f);  // truncation
    }
  } else {
    std::memset(out, 0, n);
  }
}

// Max-compose Gaussian bumps (radius-windowed) into an h*w heatmap that the
// caller pre-fills (e.g. with -1).  centers: m pairs (x, y).
void draw_gaussians(float* heatmap, int h, int w, const int* centers, int m,
                    int radius, float k) {
  const int diameter = 2 * radius + 1;
  const float sigma = diameter / 6.0f;
  std::vector<float> g(static_cast<size_t>(diameter) * diameter);
  float gmax = 0.0f;
  for (int i = 0; i < diameter; ++i)
    for (int j = 0; j < diameter; ++j) {
      const float yy = i - radius, xx = j - radius;
      const float v = std::exp(-(xx * xx + yy * yy) / (2 * sigma * sigma));
      g[i * diameter + j] = v;
      gmax = std::max(gmax, v);
    }
  const float eps = 1.1920929e-07f * gmax;  // float32 eps * max
  for (auto& v : g)
    if (v < eps) v = 0.0f;

  for (int c = 0; c < m; ++c) {
    const int x = centers[2 * c];
    const int y = centers[2 * c + 1];
    const int left = std::min(x, radius), right = std::min(w - x, radius + 1);
    const int top = std::min(y, radius), bottom = std::min(h - y, radius + 1);
    if (left + right <= 0 || top + bottom <= 0) continue;
    for (int i = -top; i < bottom; ++i)
      for (int j = -left; j < right; ++j) {
        float& dst = heatmap[(y + i) * w + (x + j)];
        const float src = g[(radius + i) * diameter + (radius + j)] * k;
        dst = std::max(dst, src);
      }
  }
}

}  // extern "C"
