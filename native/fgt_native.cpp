// fgt_native: OpenMP CPU kernels for the pipeline's host-side stages.
//
// The reference keeps these in Python (scipy sparse solves + cv2.remap,
// tool/utils/region_fill.py and common_utils.py); here the per-frame
// Laplacian diffusion and batched bilinear sampling run as native
// multithreaded code, parallel across frames/channels. The Python layer
// (fgt_tpu/native) falls back to the scipy implementations when this
// library is not built.
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Solve the discrete Laplace equation on mask pixels of img (H x W,
// float64, row-major) with Dirichlet data from the known 4-neighbors.
// Red-black SOR; matches the sparse solve of fgt_tpu.core.region_fill
// (diag = number of in-image neighbors, rhs = sum of known-neighbor
// values). Returns the iteration count.
int laplace_fill(double* img, const uint8_t* mask, int H, int W,
                 double tol, int max_iter) {
  std::vector<double> rhs(static_cast<size_t>(H) * W, 0.0);
  std::vector<float> diag(static_cast<size_t>(H) * W, 0.0f);
  std::vector<int> holes;
  holes.reserve(1024);

  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const int p = y * W + x;
      if (!mask[p]) continue;
      holes.push_back(p);
      double b = 0.0;
      float d = 0.0f;
      const int dy[4] = {-1, 1, 0, 0};
      const int dx[4] = {0, 0, -1, 1};
      for (int k = 0; k < 4; ++k) {
        const int ny = y + dy[k], nx = x + dx[k];
        if (ny < 0 || ny >= H || nx < 0 || nx >= W) continue;
        d += 1.0f;
        const int q = ny * W + nx;
        if (!mask[q]) b += img[q];  // Dirichlet contribution
      }
      rhs[p] = b;
      diag[p] = d;
      img[p] = 0.0;  // init: zeroed hole (diffusion contract)
    }
  }
  if (holes.empty()) return 0;

  // SOR relaxation factor from the hole bounding box
  int y0 = H, y1 = 0, x0 = W, x1 = 0;
  for (int p : holes) {
    const int y = p / W, x = p % W;
    if (y < y0) y0 = y;
    if (y > y1) y1 = y;
    if (x < x0) x0 = x;
    if (x > x1) x1 = x;
  }
  const int n = std::max(y1 - y0 + 1, x1 - x0 + 1);
  const double omega = 2.0 / (1.0 + std::sin(M_PI / (n + 1)));

  int it = 0;
  for (; it < max_iter; ++it) {
    double max_delta = 0.0;
    for (int color = 0; color < 2; ++color) {
#ifdef _OPENMP
#pragma omp parallel for reduction(max : max_delta) schedule(static)
#endif
      for (size_t h = 0; h < holes.size(); ++h) {
        const int p = holes[h];
        const int y = p / W, x = p % W;
        if (((y + x) & 1) != color) continue;
        double acc = rhs[p];
        if (y > 0 && mask[p - W]) acc += img[p - W];
        if (y < H - 1 && mask[p + W]) acc += img[p + W];
        if (x > 0 && mask[p - 1]) acc += img[p - 1];
        if (x < W - 1 && mask[p + 1]) acc += img[p + 1];
        const double xnew = (1.0 - omega) * img[p] + omega * acc / diag[p];
        const double delta = std::fabs(xnew - img[p]);
        if (delta > max_delta) max_delta = delta;
        img[p] = xnew;
      }
    }
    if (max_delta < tol) break;
  }
  return it;
}

// Batched diffusion: for every (frame, channel) of flows [N, H, W, C],
// zero the hole, then laplace_fill. masks: [N, H, W] uint8. Parallel
// across frames x channels.
void diffuse_flows(const float* flows, const uint8_t* masks, float* out,
                   int N, int H, int W, int C, double tol, int max_iter) {
  const size_t plane = static_cast<size_t>(H) * W;
#ifdef _OPENMP
#pragma omp parallel for collapse(2) schedule(dynamic)
#endif
  for (int i = 0; i < N; ++i) {
    for (int c = 0; c < C; ++c) {
      std::vector<double> img(plane);
      const float* src = flows + (static_cast<size_t>(i) * plane) * C + c;
      const uint8_t* m = masks + static_cast<size_t>(i) * plane;
      for (size_t p = 0; p < plane; ++p)
        img[p] = m[p] ? 0.0 : static_cast<double>(src[p * C]);
      laplace_fill(img.data(), m, H, W, tol, max_iter);
      float* dst = out + (static_cast<size_t>(i) * plane) * C + c;
      for (size_t p = 0; p < plane; ++p)
        dst[p * C] = static_cast<float>(img[p]);
    }
  }
}

// Bilinear sampling of img [H, W, C] float32 at n float coords, zero
// outside (cv2.remap INTER_LINEAR BORDER_CONSTANT semantics).
void bilinear_interp(const float* img, int H, int W, int C,
                     const float* xs, const float* ys, int64_t n,
                     float* out) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const float xf = xs[i], yf = ys[i];
    const int x0 = static_cast<int>(std::floor(xf));
    const int y0 = static_cast<int>(std::floor(yf));
    const float fx = xf - x0, fy = yf - y0;
    const float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
    const float w10 = (1 - fx) * fy, w11 = fx * fy;
    for (int c = 0; c < C; ++c) {
      double acc = 0.0;
      if (y0 >= 0 && y0 < H) {
        if (x0 >= 0 && x0 < W) acc += w00 * img[(y0 * W + x0) * C + c];
        if (x0 + 1 >= 0 && x0 + 1 < W)
          acc += w01 * img[(y0 * W + x0 + 1) * C + c];
      }
      if (y0 + 1 >= 0 && y0 + 1 < H) {
        if (x0 >= 0 && x0 < W) acc += w10 * img[((y0 + 1) * W + x0) * C + c];
        if (x0 + 1 >= 0 && x0 + 1 < W)
          acc += w11 * img[((y0 + 1) * W + x0 + 1) * C + c];
      }
      out[i * C + c] = static_cast<float>(acc);
    }
  }
}

int fgt_native_version() { return 1; }

}  // extern "C"
