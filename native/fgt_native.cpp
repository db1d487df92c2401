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

// Solve the discrete Laplace equation on mask pixels of img (H x W,
// float64, row-major) with Dirichlet data from the known 4-neighbors.
// Red-black SOR; matches the sparse solve of fgt_tpu.core.region_fill
// (diag = number of in-image neighbors, rhs = sum of known-neighbor
// values). `warm` keeps the caller's hole values as the starting guess
// (multigrid prolongation) instead of zeroing them. Returns the
// iteration count.
static int sor_relax(double* img, const uint8_t* mask, int H, int W,
                     double tol, int max_iter, bool warm) {
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
      if (!warm) img[p] = 0.0;  // init: zeroed hole (diffusion contract)
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

// ---------------------------------------------------------------------
// Geometric multigrid Laplace solve on irregular hole domains.
//
// Plain zero-init SOR needs O(diameter^2) sweeps on large holes (a
// 300k-px outpainting border hole at 864x480 costs ~19 s). V-cycles on
// a mask-coarsened hierarchy converge at a rate independent of hole
// size: red-black Gauss-Seidel smoothing, summed 2x2 residual
// restriction (correct scaling for the unscaled 5-point graph
// Laplacian), bilinear error prolongation. The fixed point is the same
// linear system as sor_relax / the scipy sparse solve, so results agree
// with the direct solve to the residual tolerance.

struct MGLevel {
  int H, W;
  std::vector<uint8_t> mask;  // 1 = unknown (hole)
  std::vector<float> diag;    // # in-image neighbors, hole px only
  std::vector<int> holes;     // flat indices of hole px
};

static MGLevel make_level(const uint8_t* mask, int H, int W) {
  MGLevel g;
  g.H = H;
  g.W = W;
  g.mask.assign(mask, mask + static_cast<size_t>(H) * W);
  g.diag.assign(static_cast<size_t>(H) * W, 0.0f);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const size_t p = static_cast<size_t>(y) * W + x;
      if (!mask[p]) continue;
      g.holes.push_back(static_cast<int>(p));
      float d = 0.0f;
      if (y > 0) d += 1.0f;
      if (y < H - 1) d += 1.0f;
      if (x > 0) d += 1.0f;
      if (x < W - 1) d += 1.0f;
      g.diag[p] = d;
    }
  }
  return g;
}

// coarse px is hole only when its whole 2x2 fine block is hole, so the
// Dirichlet boundary geometry survives coarsening (error = 0 on known px)
static MGLevel coarsen(const MGLevel& f) {
  const int Hc = f.H / 2, Wc = f.W / 2;
  std::vector<uint8_t> mc(static_cast<size_t>(Hc) * Wc, 0);
  for (int yc = 0; yc < Hc; ++yc) {
    for (int xc = 0; xc < Wc; ++xc) {
      bool all_hole = true;
      for (int dy = 0; dy < 2 && all_hole; ++dy)
        for (int dx = 0; dx < 2 && all_hole; ++dx) {
          const int y = 2 * yc + dy, x = 2 * xc + dx;
          if (y >= f.H || x >= f.W) continue;
          if (!f.mask[static_cast<size_t>(y) * f.W + x]) all_hole = false;
        }
      if (all_hole) mc[static_cast<size_t>(yc) * Wc + xc] = 1;
    }
  }
  return make_level(mc.data(), Hc, Wc);
}

// red-black Gauss-Seidel sweeps of diag*x - sum(hole neighbors) = b;
// known px never contribute (their x is 0 / folded into b by the caller)
static void mg_smooth(const MGLevel& g, std::vector<double>& x,
                      const std::vector<double>& b, int sweeps) {
  const int W = g.W;
  for (int s = 0; s < sweeps; ++s) {
    for (int color = 0; color < 2; ++color) {
      for (size_t h = 0; h < g.holes.size(); ++h) {
        const int p = g.holes[h];
        const int y = p / W, x_ = p % W;
        if (((y + x_) & 1) != color) continue;
        double acc = b[p];
        if (y > 0 && g.mask[p - W]) acc += x[p - W];
        if (y < g.H - 1 && g.mask[p + W]) acc += x[p + W];
        if (x_ > 0 && g.mask[p - 1]) acc += x[p - 1];
        if (x_ < W - 1 && g.mask[p + 1]) acc += x[p + 1];
        x[p] = acc / g.diag[p];
      }
    }
  }
}

// Writes r only at hole pixels. Non-hole entries of r are never written
// anywhere, so as long as r starts out zeroed (plan construction), they
// stay zero — and the 2x2 restriction below only reads fine-hole
// positions anyway (a coarse hole requires its whole fine block to be
// hole), so no per-call full-plane clear of r is needed.
static double mg_residual(const MGLevel& g, const std::vector<double>& x,
                          const std::vector<double>& b,
                          std::vector<double>& r) {
  const int W = g.W;
  double rmax = 0.0;
  for (size_t h = 0; h < g.holes.size(); ++h) {
    const int p = g.holes[h];
    const int y = p / W, x_ = p % W;
    double acc = b[p] - g.diag[p] * x[p];
    if (y > 0 && g.mask[p - W]) acc += x[p - W];
    if (y < g.H - 1 && g.mask[p + W]) acc += x[p + W];
    if (x_ > 0 && g.mask[p - 1]) acc += x[p - 1];
    if (x_ < W - 1 && g.mask[p + 1]) acc += x[p + 1];
    r[p] = acc;
    const double a = std::fabs(acc);
    if (a > rmax) rmax = a;
  }
  return rmax;
}

static void mg_vcycle(const std::vector<MGLevel>& levels, size_t l,
                      std::vector<std::vector<double>>& xs,
                      std::vector<std::vector<double>>& bs,
                      std::vector<std::vector<double>>& rs) {
  const MGLevel& g = levels[l];
  if (l + 1 == levels.size()) {
    // coarsest: smooth to convergence (domain is tiny)
    mg_smooth(g, xs[l], bs[l], 200);
    return;
  }
  mg_smooth(g, xs[l], bs[l], 2);
  mg_residual(g, xs[l], bs[l], rs[l]);

  const MGLevel& c = levels[l + 1];
  // restriction: SUM the 2x2 fine residuals (4x the average — the
  // correct inter-grid scaling for the h-free 5-point operator).
  // bs[l+1] is written at every coarse hole and only ever read at
  // coarse holes, so no clear is needed.
  for (size_t h = 0; h < c.holes.size(); ++h) {
    const int pc = c.holes[h];
    const int yc = pc / c.W, xc = pc % c.W;
    double sum = 0.0;
    for (int dy = 0; dy < 2; ++dy)
      for (int dx = 0; dx < 2; ++dx) {
        const int y = 2 * yc + dy, x = 2 * xc + dx;
        if (y >= g.H || x >= g.W) continue;
        sum += rs[l][static_cast<size_t>(y) * g.W + x];
      }
    bs[l + 1][pc] = sum;
  }
  // the error correction starts at 0 on the coarse holes; non-hole
  // entries (read by the bilinear prolongation taps) are never written,
  // so they stay zero from plan construction — clear holes only
  for (size_t h = 0; h < c.holes.size(); ++h) xs[l + 1][c.holes[h]] = 0.0;
  mg_vcycle(levels, l + 1, xs, bs, rs);

  // prolongation: bilinear error interpolation added into the fine hole
  // (coarse px (yc, xc) sits at fine (2*yc + 0.5, 2*xc + 0.5))
  const std::vector<double>& e = xs[l + 1];
  for (size_t h = 0; h < g.holes.size(); ++h) {
    const int p = g.holes[h];
    const int y = p / g.W, x = p % g.W;
    double fy = (y - 0.5) / 2.0, fx = (x - 0.5) / 2.0;
    if (fy < 0) fy = 0;
    if (fx < 0) fx = 0;
    if (fy > c.H - 1) fy = c.H - 1;
    if (fx > c.W - 1) fx = c.W - 1;
    const int y0 = static_cast<int>(fy), x0 = static_cast<int>(fx);
    const int y1 = y0 + 1 < c.H ? y0 + 1 : y0;
    const int x1 = x0 + 1 < c.W ? x0 + 1 : x0;
    const double wy = fy - y0, wx = fx - x0;
    xs[l][p] += (1 - wy) * ((1 - wx) * e[static_cast<size_t>(y0) * c.W + x0]
                            + wx * e[static_cast<size_t>(y0) * c.W + x1])
              + wy * ((1 - wx) * e[static_cast<size_t>(y1) * c.W + x0]
                      + wx * e[static_cast<size_t>(y1) * c.W + x1]);
  }
  mg_smooth(g, xs[l], bs[l], 2);
}

// Reusable multigrid plan. Building the level hierarchy and zeroing the
// per-level work buffers is O(plane) and dominates small-hole solves on
// slow-first-touch hosts; a plan amortizes it across the two flow
// channels of a frame (identical mask) and across frames with identical
// masks (static watermark / outpainting-border holes).
struct FMGPlan {
  int H = 0, W = 0;
  std::vector<MGLevel> levels;
  std::vector<std::vector<double>> xs, bs, rs;
  std::vector<uint8_t> built_mask;  // the mask this plan was built for

  bool matches(const uint8_t* mask, int h, int w) const {
    return h == H && w == W && !built_mask.empty() &&
           std::memcmp(built_mask.data(), mask,
                       static_cast<size_t>(h) * w) == 0;
  }

  void build(const uint8_t* mask, int h, int w) {
    H = h;
    W = w;
    built_mask.assign(mask, mask + static_cast<size_t>(h) * w);
    levels.clear();
    levels.push_back(make_level(mask, H, W));
    while (levels.back().holes.size() > 512 && levels.back().H >= 32 &&
           levels.back().W >= 32)
      levels.push_back(coarsen(levels.back()));
    xs.clear();
    bs.clear();
    rs.clear();
    for (const MGLevel& g : levels) {
      const size_t n = static_cast<size_t>(g.H) * g.W;
      xs.emplace_back(n, 0.0);
      bs.emplace_back(n, 0.0);
      rs.emplace_back(n, 0.0);
    }
  }

  // Solve in-place on img (full plane, holes overwritten). The work
  // buffers only ever carry non-zero values at hole positions, and every
  // hole position read is written first within a solve, so no clearing
  // between solves is needed beyond the xs[0] start-at-zero contract.
  int solve(double* img, double tol, int max_cycles = 50) {
    const MGLevel& fine = levels[0];
    // fine-level rhs: Dirichlet contributions from known neighbors;
    // unknowns start at 0 (same contract as sor_relax)
    double bscale = 1e-12;
    for (size_t h = 0; h < fine.holes.size(); ++h) {
      const int p = fine.holes[h];
      const int y = p / W, x = p % W;
      double b = 0.0;
      if (y > 0 && !fine.mask[p - W]) b += img[p - W];
      if (y < H - 1 && !fine.mask[p + W]) b += img[p + W];
      if (x > 0 && !fine.mask[p - 1]) b += img[p - 1];
      if (x < W - 1 && !fine.mask[p + 1]) b += img[p + 1];
      bs[0][p] = b;
      xs[0][p] = 0.0;
      const double a = std::fabs(b);
      if (a > bscale) bscale = a;
    }

    // V-cycles to a residual tolerance relative to the boundary-data
    // scale (each cycle contracts the residual ~10x)
    int cycles = 0;
    for (; cycles < max_cycles; ++cycles) {
      mg_vcycle(levels, 0, xs, bs, rs);
      const double rmax = mg_residual(levels[0], xs[0], bs[0], rs[0]);
      if (rmax < tol * bscale) break;
    }
    for (size_t h = 0; h < fine.holes.size(); ++h) {
      const int p = fine.holes[h];
      img[p] = xs[0][p];
    }
    return cycles + 1;
  }
};

static int laplace_fmg(double* img, const uint8_t* mask, int H, int W,
                       double tol, int max_iter) {
  const size_t plane = static_cast<size_t>(H) * W;
  size_t nhole = 0;
  for (size_t p = 0; p < plane; ++p) nhole += mask[p] ? 1 : 0;
  if (nhole == 0) return 0;
  if (nhole < 2048 || H < 32 || W < 32)
    return sor_relax(img, mask, H, W, tol, max_iter, /*warm=*/false);

  FMGPlan plan;
  plan.build(mask, H, W);
  return plan.solve(img, tol);
}

extern "C" {

int laplace_fill(double* img, const uint8_t* mask, int H, int W,
                 double tol, int max_iter) {
  return sor_relax(img, mask, H, W, tol, max_iter, /*warm=*/false);
}

// Exported multigrid variant (used by diffuse_flows; also bound in
// fgt_tpu/native for direct calls).
int laplace_fill_fmg(double* img, const uint8_t* mask, int H, int W,
                     double tol, int max_iter) {
  return laplace_fmg(img, mask, H, W, tol, max_iter);
}

// Batched diffusion: for every (frame, channel) of flows [N, H, W, C],
// zero the hole, then laplace_fill. masks: [N, H, W] uint8. Parallel
// across frames; the channels of a frame share one multigrid plan
// (identical mask), and each thread keeps its plan across frames so
// static-mask workloads (watermark, outpainting border) build the
// hierarchy once instead of N x C times.
void diffuse_flows(const float* flows, const uint8_t* masks, float* out,
                   int N, int H, int W, int C, double tol, int max_iter) {
  const size_t plane = static_cast<size_t>(H) * W;
  int nthreads = 1;
#ifdef _OPENMP
  nthreads = omp_get_max_threads();
#endif
  // When frames alone can't feed every thread (e.g. a 3-flow LAFC window
  // with C=2 on a wide host), spread (frame, channel) pairs instead; each
  // thread keeps its own plan keyed by matches(), so channels of one frame
  // landing on different threads each build at most one hierarchy.
  const bool by_channel = N < nthreads && C > 1;
  const int total = by_channel ? N * C : N;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    FMGPlan plan;
    std::vector<double> img(plane);
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int k = 0; k < total; ++k) {
      const int i = by_channel ? k / C : k;
      const int c_lo = by_channel ? k % C : 0;
      const int c_hi = by_channel ? c_lo + 1 : C;
      const uint8_t* m = masks + static_cast<size_t>(i) * plane;
      size_t nhole = 0;
      for (size_t p = 0; p < plane; ++p) nhole += m[p] ? 1 : 0;
      if (nhole == 0) {
        const float* src = flows + (static_cast<size_t>(i) * plane) * C;
        float* dst = out + (static_cast<size_t>(i) * plane) * C;
        if (!by_channel) {
          std::memcpy(dst, src, plane * C * sizeof(float));
        } else {
          for (size_t p = 0; p < plane; ++p)
            dst[p * C + c_lo] = src[p * C + c_lo];
        }
        continue;
      }
      const bool use_mg = nhole >= 2048 && H >= 32 && W >= 32;
      if (use_mg && !plan.matches(m, H, W)) plan.build(m, H, W);
      for (int c = c_lo; c < c_hi; ++c) {
        const float* src = flows + (static_cast<size_t>(i) * plane) * C + c;
        for (size_t p = 0; p < plane; ++p)
          img[p] = m[p] ? 0.0 : static_cast<double>(src[p * C]);
        if (use_mg)
          plan.solve(img.data(), tol);
        else
          sor_relax(img.data(), m, H, W, tol, max_iter, /*warm=*/false);
        float* dst = out + (static_cast<size_t>(i) * plane) * C + c;
        for (size_t p = 0; p < plane; ++p)
          dst[p * C] = static_cast<float>(img[p]);
      }
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

// --- flowNN gradient propagation (reference tool/get_flowNN_gradient.py) ---
//
// One directional chaining pass. Frames are processed sequentially in chain
// order (the transitive case reads the previous frame's finished state);
// pixels within a frame are independent and parallel.
//
// Layouts (all row-major contiguous):
//   mask        [N, H, W] uint8 (1 = hole)
//   flow_follow [N-1, H, W, 2] flow from frame t to the source frame
//   flow_check  [N-1, H, W, 2] flow from the source frame back to t
//   have        [N, H, W] uint8 out (caller-zeroed)
//   nn_x/nn_y   [N, H, W] f32 out (chain endpoint, sub-pixel)
//   nn_t        [N, H, W] i32 out (endpoint frame, caller-filled -1)
//   cons_u/v    [N, H, W] f32 out (running max |cycle err| along the chain)
static inline void bilerp2(const float* flow, int H, int W, float xf,
                           float yf, float* u, float* v) {
  // zero-outside bilinear of a [H, W, 2] field (cv2.remap INTER_LINEAR
  // BORDER_CONSTANT semantics, matching propagation.interp).
  const int x0 = static_cast<int>(std::floor(xf));
  const int y0 = static_cast<int>(std::floor(yf));
  const float fx = xf - x0, fy = yf - y0;
  const float w[4] = {(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy,
                      fx * fy};
  const int ys[4] = {y0, y0, y0 + 1, y0 + 1};
  const int xs[4] = {x0, x0 + 1, x0, x0 + 1};
  float au = 0.f, av = 0.f;
  for (int k = 0; k < 4; ++k) {
    if (ys[k] < 0 || ys[k] >= H || xs[k] < 0 || xs[k] >= W) continue;
    const float* p = flow + (static_cast<size_t>(ys[k]) * W + xs[k]) * 2;
    au += w[k] * p[0];
    av += w[k] * p[1];
  }
  *u = au;
  *v = av;
}

void flownn_pass(const uint8_t* mask, const float* flow_follow,
                 const float* flow_check, int forward, int N, int H, int W,
                 float thres, uint8_t* have, float* nn_x, float* nn_y,
                 int32_t* nn_t, float* cons_u, float* cons_v) {
  const size_t plane = static_cast<size_t>(H) * W;
  for (int step = 0; step < N - 1; ++step) {
    const int t = forward ? 1 + step : N - 2 - step;
    const int src = forward ? t - 1 : t + 1;
    const int fidx = forward ? t - 1 : t;
    const float* ff = flow_follow + static_cast<size_t>(fidx) * plane * 2;
    const float* fc = flow_check + static_cast<size_t>(fidx) * plane * 2;
    const uint8_t* mt = mask + static_cast<size_t>(t) * plane;
    const uint8_t* msrc = mask + static_cast<size_t>(src) * plane;
    const size_t ot = static_cast<size_t>(t) * plane;
    const size_t os = static_cast<size_t>(src) * plane;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8)
#endif
    for (int y = 0; y < H; ++y) {
      for (int x = 0; x < W; ++x) {
        const size_t p = static_cast<size_t>(y) * W + x;
        if (!mt[p]) continue;
        const float fu = ff[p * 2], fv = ff[p * 2 + 1];
        const float tx = x + fu, ty = y + fv;
        float bu, bv;
        bilerp2(fc, H, W, tx, ty, &bu, &bv);
        // cycle error == the reference's consistCheck uv at this pixel
        const float eu = tx + bu - x, ev = ty + bv - y;
        if (std::sqrt(eu * eu + ev * ev) >= thres) continue;
        // np.round = half-to-even = nearbyint under FE_TONEAREST
        const int tyi = static_cast<int>(std::nearbyint(ty));
        const int txi = static_cast<int>(std::nearbyint(tx));
        // last row/col carry no valid gradient -> strict bounds
        if (tyi < 0 || tyi >= H - 1 || txi < 0 || txi >= W - 1) continue;
        const size_t q = static_cast<size_t>(tyi) * W + txi;
        if (!msrc[q]) {  // direct known neighbor
          have[ot + p] = 1;
          nn_x[ot + p] = tx;
          nn_y[ot + p] = ty;
          nn_t[ot + p] = src;
          cons_u[ot + p] = std::fabs(eu);
          cons_v[ot + p] = std::fabs(ev);
        } else if (have[os + q]) {  // transitive chain through a hole px
          const float cy = nn_y[os + q] + (ty - tyi);
          const float cx = nn_x[os + q] + (tx - txi);
          const int cyi = static_cast<int>(std::nearbyint(cy));
          const int cxi = static_cast<int>(std::nearbyint(cx));
          if (cyi < 0 || cyi >= H - 1 || cxi < 0 || cxi >= W - 1) continue;
          have[ot + p] = 1;
          nn_x[ot + p] = cx;
          nn_y[ot + p] = cy;
          nn_t[ot + p] = nn_t[os + q];
          cons_u[ot + p] = std::max(std::fabs(eu), std::fabs(cons_u[os + q]));
          cons_v[ot + p] = std::max(std::fabs(ev), std::fabs(cons_v[os + q]));
        }
      }
    }
  }
}

// Chain-endpoint gradient sampling. grad [N, H, W, C] is filled in place;
// source frames are visited in chain order so transitively filled values
// feed later frames (reference get_flowNN_gradient.py:372-435). Hole
// pixels are bucketed by endpoint frame once instead of re-scanning the
// volume per source frame.
void flownn_sample(float* grad, const uint8_t* have, const float* nn_x,
                   const float* nn_y, const int32_t* nn_t, int forward,
                   int N, int H, int W, int C) {
  const size_t plane = static_cast<size_t>(H) * W;
  const size_t total = plane * N;
  std::vector<int64_t> count(N + 1, 0);
  for (size_t i = 0; i < total; ++i)
    if (have[i]) ++count[nn_t[i] + 1];
  std::vector<int64_t> offset(N + 1, 0);
  for (int s = 0; s < N; ++s) offset[s + 1] = offset[s] + count[s + 1];
  std::vector<int64_t> bucket(offset[N]);
  std::vector<int64_t> cursor(offset.begin(), offset.end() - 1);
  for (size_t i = 0; i < total; ++i)
    if (have[i]) bucket[cursor[nn_t[i]]++] = static_cast<int64_t>(i);

  for (int step = 0; step < N; ++step) {
    const int s = forward ? step : N - 1 - step;
    const float* src = grad + static_cast<size_t>(s) * plane * C;
    const int64_t lo = offset[s], hi = offset[s + 1];
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t e = lo; e < hi; ++e) {
      const int64_t i = bucket[e];
      const float xf = nn_x[i], yf = nn_y[i];
      const int x0 = static_cast<int>(std::floor(xf));
      const int y0 = static_cast<int>(std::floor(yf));
      const float fx = xf - x0, fy = yf - y0;
      const float w[4] = {(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy,
                          fx * fy};
      const int ys[4] = {y0, y0, y0 + 1, y0 + 1};
      const int xs[4] = {x0, x0 + 1, x0, x0 + 1};
      float* dst = grad + static_cast<size_t>(i) * C;
      for (int c = 0; c < C; ++c) dst[c] = 0.f;
      for (int k = 0; k < 4; ++k) {
        if (ys[k] < 0 || ys[k] >= H || xs[k] < 0 || xs[k] >= W) continue;
        const float* p = src + (static_cast<size_t>(ys[k]) * W + xs[k]) * C;
        for (int c = 0; c < C; ++c) dst[c] += w[k] * p[c];
      }
    }
  }
}

// Poisson connectivity check (reference Poisson_blend_img.py:151-178):
// hole pixels NOT reachable from known pixels through gradient-valid
// 4-paths. The two monotone sweeps have acyclic dependencies (up/left,
// then down/right), so one raster pass per sweep computes the exact
// fixpoint the reference's repeated whole-image iterations converge to.
// Top-left sweep checks gradientMask at the NEIGHBOR; bottom-right at
// the PIXEL — both quirks preserved.
void unfilled_mask(const uint8_t* hole, const uint8_t* gm, int H, int W,
                   uint8_t* out) {
  const size_t n = static_cast<size_t>(H) * W;
  std::vector<uint8_t> tl(hole, hole + n);
  std::vector<uint8_t> br(hole, hole + n);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      const size_t i = static_cast<size_t>(y) * W + x;
      if (!tl[i]) continue;
      const bool up = y > 0 && !tl[i - W] && !gm[i - W];
      const bool left = x > 0 && !tl[i - 1] && !gm[i - 1];
      if (up || left) tl[i] = 0;
    }
  }
  for (int y = H - 1; y >= 0; --y) {
    for (int x = W - 1; x >= 0; --x) {
      const size_t i = static_cast<size_t>(y) * W + x;
      if (!br[i] || gm[i]) continue;
      const bool down = y < H - 1 && !br[i + W];
      const bool right = x < W - 1 && !br[i + 1];
      if (down || right) br[i] = 0;
    }
  }
  for (size_t i = 0; i < n; ++i) out[i] = tl[i] & br[i];
}

// BN/FN candidate fusion (reference get_flowNN_gradient.py:466-534):
// per hole pixel, blend the two directions' sampled gradients with
// exp(-consistency/alpha) weights; equal-split fallback when both
// weights underflow; pixels with no candidate stay unfilled. Writes gx
// and gy IN PLACE (only at hole pixels) and emits the tofill mask —
// the Python-side fusion this replaces allocated GB-scale f64 index /
// weight temporaries, which on slow-first-touch hosts dominated the
// whole stage (see fgt_tpu/pipeline/propagation.py).
void flownn_fuse(float* gx, float* gy, const float* s_bn, const float* s_fn,
                 const uint8_t* have_bn, const float* cu_bn,
                 const float* cv_bn, const uint8_t* have_fn,
                 const float* cu_fn, const float* cv_fn,
                 const uint8_t* mask, uint8_t* tofill, float alpha,
                 int N, int H, int W, int C) {
  const int64_t total = static_cast<int64_t>(N) * H * W;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < total; ++i) {
    if (!mask[i]) {
      tofill[i] = 0;
      continue;
    }
    const bool hb = have_bn[i] != 0, hf = have_fn[i] != 0;
    if (!hb && !hf) {
      tofill[i] = 1;
      continue;
    }
    tofill[i] = 0;
    // f32 math end-to-end, matching the numpy path it replaces
    // (cons arrays were f32; np.exp on f32 stays f32)
    float w0 = hb ? std::exp(-std::sqrt(cu_bn[i] * cu_bn[i]
                                        + cv_bn[i] * cv_bn[i]) / alpha)
                  : 0.f;
    float w1 = hf ? std::exp(-std::sqrt(cu_fn[i] * cu_fn[i]
                                        + cv_fn[i] * cv_fn[i]) / alpha)
                  : 0.f;
    const float s = w0 + w1;
    if (s > 0.f) {
      const float inv = 1.f / (s < 1e-30f ? 1e-30f : s);
      w0 *= inv;
      w1 *= inv;
    } else {  // both weights underflowed: equal split over candidates
      const float inv = 1.f / static_cast<float>((hb ? 1 : 0) + (hf ? 1 : 0));
      w0 = hb ? inv : 0.f;
      w1 = hf ? inv : 0.f;
    }
    const float* bx = s_bn + i * 2 * C;
    const float* fx = s_fn + i * 2 * C;
    float* dx = gx + i * C;
    float* dy = gy + i * C;
    for (int c = 0; c < C; ++c) {
      dx[c] = w0 * bx[c] + w1 * fx[c];
      dy[c] = w0 * bx[C + c] + w1 * fx[C + c];
    }
  }
}

int fgt_native_version() { return 4; }

}  // extern "C"
