// CPU baseline for the reference's analytic photoconsistency alignment.
//
// The reference (MiguelAlgaba/photoconsistency-visual-odometry) publishes no
// benchmark numbers (SURVEY.md §6), so this program measures a faithful
// re-execution of its analytic backend's per-frame work on this machine's
// CPU: 5-level pyramid (bilinear resize), Scharr gradient pyramids, then
// coarse-to-fine Gauss-Newton with the per-pixel
// backproject/transform/project/residual/2x6-Jacobian kernel in double
// precision (the reference's CoordinateType), single-threaded (the
// reference's OpenMP pragmas ship disabled). Iteration schedule matches
// bench.py: [0,0,5,20,50] iterations at levels 4..0, gradient-norm
// termination disabled so every alignment does identical work.
//
// This is an independent implementation of the same math (standard dense VO
// chain rule), written for this benchmark; it is intentionally *generous* to
// the baseline: J^T J / J^T r are accumulated in-loop instead of
// materializing the N x 6 Jacobian like the reference does, so the measured
// CPU figure is an upper bound on the reference's real speed.
//
// Output: {"frames_per_second": F} on stdout (and optional arg: repeat count).

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

using std::vector;

struct Image {
  int rows = 0, cols = 0;
  vector<double> data;
  Image() = default;
  Image(int r, int c) : rows(r), cols(c), data((size_t)r * c, 0.0) {}
  double &at(int r, int c) { return data[(size_t)r * cols + c]; }
  double at(int r, int c) const { return data[(size_t)r * cols + c]; }
};

// --- synthetic scene (same slanted textured plane as phovo_tpu.utils.synthetic)
static double texture(double x, double y) {
  double v = 0.5 + 0.18 * std::sin(3.1 * x) * std::cos(2.3 * y) +
             0.12 * std::sin(7.3 * x + 1.1) + 0.10 * std::cos(5.7 * y + 0.4) +
             0.10 * std::sin(2.1 * (x + y));
  return v < 0 ? 0 : (v > 1 ? 1 : v);
}

static void render_plane(double fx, double fy, double cx, double cy, int H,
                         int W, const double T[4][4], Image &I, Image &D) {
  const double n[3] = {0.06, -0.04, 1.0};
  const double d = 2.0;
  double R[3][3], t[3];
  for (int i = 0; i < 3; i++) {
    t[i] = T[i][3];
    for (int j = 0; j < 3; j++) R[i][j] = T[i][j];
  }
  double nc[3] = {0, 0, 0};
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) nc[i] += R[i][j] * n[j];
  double dc = d + nc[0] * t[0] + nc[1] * t[1] + nc[2] * t[2];
  I = Image(H, W);
  D = Image(H, W);
  for (int r = 0; r < H; r++) {
    for (int c = 0; c < W; c++) {
      double vx = (c - cx) / fx, vy = (r - cy) / fy;
      double denom = nc[0] * vx + nc[1] * vy + nc[2];
      double z = dc / (denom > 1e-9 ? denom : 1e-9);
      double pc[3] = {vx * z, vy * z, z};
      double pw[3] = {0, 0, 0};
      for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) pw[i] += R[j][i] * (pc[j] - t[j]);
      I.at(r, c) = texture(pw[0], pw[1]);
      D.at(r, c) = z;
    }
  }
}

static void pose_from_state(const double s[6], double T[4][4]) {
  double x = s[0], y = s[1], z = s[2], yaw = s[3], pitch = s[4], roll = s[5];
  double cy = std::cos(yaw), sy = std::sin(yaw);
  double cp = std::cos(pitch), sp = std::sin(pitch);
  double cr = std::cos(roll), sr = std::sin(roll);
  double M[4][4] = {{cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr, x},
                    {sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr, y},
                    {-sp, cp * sr, cp * cr, z},
                    {0, 0, 0, 1}};
  for (int i = 0; i < 4; i++)
    for (int j = 0; j < 4; j++) T[i][j] = M[i][j];
}

// --- image ops matching OpenCV semantics used by the reference
static int reflect101(int i, int n) {
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * (n - 1) - i;
  }
  return i;
}

static Image resize_bilinear(const Image &src, int Ho, int Wo) {
  Image out(Ho, Wo);
  double sr = (double)src.rows / Ho, sc = (double)src.cols / Wo;
  for (int r = 0; r < Ho; r++) {
    double fr = (r + 0.5) * sr - 0.5;
    int r0 = (int)std::floor(fr);
    double wr = fr - r0;
    int r0c = r0 < 0 ? 0 : (r0 >= src.rows ? src.rows - 1 : r0);
    int r1c = r0 + 1 < 0 ? 0 : (r0 + 1 >= src.rows ? src.rows - 1 : r0 + 1);
    for (int c = 0; c < Wo; c++) {
      double fc = (c + 0.5) * sc - 0.5;
      int c0 = (int)std::floor(fc);
      double wc = fc - c0;
      int c0c = c0 < 0 ? 0 : (c0 >= src.cols ? src.cols - 1 : c0);
      int c1c = c0 + 1 < 0 ? 0 : (c0 + 1 >= src.cols ? src.cols - 1 : c0 + 1);
      double top = src.at(r0c, c0c) * (1 - wc) + src.at(r0c, c1c) * wc;
      double bot = src.at(r1c, c0c) * (1 - wc) + src.at(r1c, c1c) * wc;
      out.at(r, c) = top * (1 - wr) + bot * wr;
    }
  }
  return out;
}

// Scharr: deriv [-1 0 1], smooth [3 10 3], reflect-101 borders.
static void scharr(const Image &src, Image &gx, Image &gy, double scale) {
  int H = src.rows, W = src.cols;
  gx = Image(H, W);
  gy = Image(H, W);
  Image tmp1(H, W), tmp2(H, W);
  // horizontal passes
  for (int r = 0; r < H; r++)
    for (int c = 0; c < W; c++) {
      int cm = reflect101(c - 1, W), cp = reflect101(c + 1, W);
      tmp1.at(r, c) = src.at(r, cp) - src.at(r, cm);                    // deriv x
      tmp2.at(r, c) = 3 * src.at(r, cm) + 10 * src.at(r, c) + 3 * src.at(r, cp);  // smooth x
    }
  // vertical passes
  for (int r = 0; r < H; r++) {
    int rm = reflect101(r - 1, H), rp = reflect101(r + 1, H);
    for (int c = 0; c < W; c++) {
      gx.at(r, c) = scale * (3 * tmp1.at(rm, c) + 10 * tmp1.at(r, c) + 3 * tmp1.at(rp, c));
      gy.at(r, c) = scale * (tmp2.at(rp, c) - tmp2.at(rm, c));
    }
  }
}

static bool solve6(double A[6][6], double b[6], double x[6]) {
  // Gaussian elimination with partial pivoting
  int idx[6] = {0, 1, 2, 3, 4, 5};
  for (int k = 0; k < 6; k++) {
    int p = k;
    for (int i = k + 1; i < 6; i++)
      if (std::fabs(A[idx[i]][k]) > std::fabs(A[idx[p]][k])) p = i;
    std::swap(idx[k], idx[p]);
    double piv = A[idx[k]][k];
    if (std::fabs(piv) < 1e-18) return false;
    for (int i = k + 1; i < 6; i++) {
      double f = A[idx[i]][k] / piv;
      for (int j = k; j < 6; j++) A[idx[i]][j] -= f * A[idx[k]][j];
      b[idx[i]] -= f * b[idx[k]];
    }
  }
  for (int k = 5; k >= 0; k--) {
    double s = b[idx[k]];
    for (int j = k + 1; j < 6; j++) s -= A[idx[k]][j] * x[j];
    x[k] = s / A[idx[k]][k];
  }
  return true;
}

struct Level {
  Image I0, D0, I1, gx1, gy1;
};

// One Gauss-Newton iteration: returns gradient vector g and accumulates step.
static void gn_iteration(const Level &L, double fx, double fy, double ox,
                         double oy, double minD, double maxD, double lambda,
                         double state[6]) {
  int H = L.I0.rows, W = L.I0.cols;
  double T[4][4];
  pose_from_state(state, T);
  double syaw = std::sin(state[3]), cyaw = std::cos(state[3]);
  double spitch = std::sin(state[4]), cpitch = std::cos(state[4]);
  double sroll = std::sin(state[5]), croll = std::cos(state[5]);
  // dR/dyaw, dR/dpitch, dR/droll
  double dRy[3][3] = {{-syaw * cpitch, -syaw * spitch * sroll - cyaw * croll,
                       -syaw * spitch * croll + cyaw * sroll},
                      {cyaw * cpitch, cyaw * spitch * sroll - syaw * croll,
                       cyaw * spitch * croll + syaw * sroll},
                      {0, 0, 0}};
  double dRp[3][3] = {{-cyaw * spitch, cyaw * cpitch * sroll, cyaw * cpitch * croll},
                      {-syaw * spitch, syaw * cpitch * sroll, syaw * cpitch * croll},
                      {-cpitch, -spitch * sroll, -spitch * croll}};
  double dRr[3][3] = {{0, cyaw * spitch * croll + syaw * sroll,
                       -cyaw * spitch * sroll + syaw * croll},
                      {0, syaw * spitch * croll - cyaw * sroll,
                       -syaw * spitch * sroll - cyaw * croll},
                      {0, cpitch * croll, -cpitch * sroll}};

  double JtJ[6][6] = {{0}}, Jtr[6] = {0};
  double inv_fx = 1.0 / fx, inv_fy = 1.0 / fy;
  for (int r = 0; r < H; r++) {
    for (int c = 0; c < W; c++) {
      double pz = L.D0.at(r, c);
      if (!(minD < pz && pz < maxD)) continue;
      double px = (c - ox) * pz * inv_fx;
      double py = (r - oy) * pz * inv_fy;
      double tx = T[0][0] * px + T[0][1] * py + T[0][2] * pz + T[0][3];
      double ty = T[1][0] * px + T[1][1] * py + T[1][2] * pz + T[1][3];
      double tz = T[2][0] * px + T[2][1] * py + T[2][2] * pz + T[2][3];
      if (tz <= 0) continue;
      double iz = 1.0 / tz;
      double u = tx * fx * iz + ox;
      double v = ty * fy * iz + oy;
      int ui = (int)std::lround(u), vi = (int)std::lround(v);
      if (ui < 0 || ui >= W || vi < 0 || vi >= H) continue;
      double res = L.I1.at(vi, ui) - L.I0.at(r, c);
      double gx = L.gx1.at(vi, ui), gy = L.gy1.at(vi, ui);
      // J_rt rotation columns
      double ry[3] = {dRy[0][0] * px + dRy[0][1] * py + dRy[0][2] * pz,
                      dRy[1][0] * px + dRy[1][1] * py + dRy[1][2] * pz,
                      dRy[2][0] * px + dRy[2][1] * py + dRy[2][2] * pz};
      double rp[3] = {dRp[0][0] * px + dRp[0][1] * py + dRp[0][2] * pz,
                      dRp[1][0] * px + dRp[1][1] * py + dRp[1][2] * pz,
                      dRp[2][0] * px + dRp[2][1] * py + dRp[2][2] * pz};
      double rr[3] = {dRr[0][0] * px + dRr[0][1] * py + dRr[0][2] * pz,
                      dRr[1][0] * px + dRr[1][1] * py + dRr[1][2] * pz,
                      dRr[2][0] * px + dRr[2][1] * py + dRr[2][2] * pz};
      // J_proj rows
      double a0 = fx * iz, a2 = -fx * tx * iz * iz;
      double b1 = fy * iz, b2 = -fy * ty * iz * iz;
      // pixel jacobian rows (u then v) x 6 params
      double Ju[6] = {a0, 0, a2, a0 * ry[0] + a2 * ry[2],
                      a0 * rp[0] + a2 * rp[2], a0 * rr[0] + a2 * rr[2]};
      double Jv[6] = {0, b1, b2, b1 * ry[1] + b2 * ry[2],
                      b1 * rp[1] + b2 * rp[2], b1 * rr[1] + b2 * rr[2]};
      double J[6];
      for (int k = 0; k < 6; k++) J[k] = gx * Ju[k] + gy * Jv[k];
      for (int i = 0; i < 6; i++) {
        Jtr[i] += J[i] * res;
        for (int j = i; j < 6; j++) JtJ[i][j] += J[i] * J[j];
      }
    }
  }
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < i; j++) JtJ[i][j] = JtJ[j][i];
  double step[6];
  if (solve6(JtJ, Jtr, step))
    for (int k = 0; k < 6; k++) state[k] -= lambda * step[k];
}

int main(int argc, char **argv) {
  int repeats = argc > 1 ? std::atoi(argv[1]) : 5;
  const int H = 480, W = 640, LEVELS = 5;
  const double fx = 517.3, fy = 516.5, cx = 318.6, cyy = 255.3;
  const int iters[LEVELS] = {0, 0, 5, 20, 50};  // level 0..4
  const double grad_scale = 0.0625, minD = 0.3, maxD = 5.0, lambda = 1.0;

  double I4[4][4], gt_T[4][4];
  const double zero_state[6] = {0, 0, 0, 0, 0, 0};
  const double gt_state[6] = {0.02, -0.015, 0.01, 0.008, -0.006, 0.01};
  pose_from_state(zero_state, I4);
  pose_from_state(gt_state, gt_T);
  Image I0, D0, I1, D1;
  render_plane(fx, fy, cx, cyy, H, W, I4, I0, D0);
  render_plane(fx, fy, cx, cyy, H, W, gt_T, I1, D1);

  double total = 0.0, checksum = 0.0;
  for (int rep = 0; rep < repeats; rep++) {
    auto t0 = std::chrono::steady_clock::now();
    // build pyramids (part of per-frame work, like the reference's
    // SetSourceFrame/SetTargetFrame)
    vector<Level> levels(LEVELS);
    for (int l = 0; l < LEVELS; l++) {
      int h = (int)std::lround(H / std::pow(2.0, l));
      int w = (int)std::lround(W / std::pow(2.0, l));
      levels[l].I0 = l ? resize_bilinear(I0, h, w) : I0;
      levels[l].D0 = l ? resize_bilinear(D0, h, w) : D0;
      levels[l].I1 = l ? resize_bilinear(I1, h, w) : I1;
      scharr(levels[l].I1, levels[l].gx1, levels[l].gy1, grad_scale);
    }
    double state[6] = {0, 0, 0, 0, 0, 0};
    for (int l = LEVELS - 1; l >= 0; l--) {
      double s = 1.0 / std::pow(2.0, l);
      for (int it = 0; it < iters[l]; it++)
        gn_iteration(levels[l], fx * s, fy * s, cx * s, cyy * s, minD, maxD,
                     lambda, state);
    }
    auto t1 = std::chrono::steady_clock::now();
    total += std::chrono::duration<double>(t1 - t0).count();
    checksum += state[0];
  }
  double fps = repeats / total;
  std::fprintf(stderr, "final state x=%.6f (checksum %.6f)\n", checksum / repeats,
               checksum);
  std::printf("{\"frames_per_second\": %.4f, \"seconds_per_frame\": %.5f}\n", fps,
              total / repeats);
  return 0;
}
