// SE(3) pose-graph refinement: Gauss-Newton over keyframe poses.
//
// Native-runtime component of the TPU SLAM stack (the analogue of the
// reference's C++ layer, re-purposed: the reference's C++ only marshals
// tensors — here the native side owns the latency-bound, host-shaped
// subsystem the BASELINE north star calls "keyframe pose-graph refinement
// (Schur complement)").  Small dense problems (K keyframes, 6K variables)
// are CPU work: sequential Cholesky beats a TPU round-trip at this size.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (models/pose_graph.py); no pybind11 dependency.
//
// Problem: minimize  sum_e w_e * || log( Z_e^{-1} * X_i^{-1} * X_j ) ||^2
// over keyframe poses X_k in SE(3), with X_0 held fixed (gauge).
// Z_e are measured relative transforms (odometry / loop closures).
// Right-multiplicative local parametrization, Gauss-Newton with dense
// Cholesky on the 6(K-1) system.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Mat4 {
  double m[16];  // row-major, column-vector convention: p' = M p
  double* operator[](int r) { return m + 4 * r; }
  const double* operator[](int r) const { return m + 4 * r; }
};

Mat4 identity() {
  Mat4 r{};
  r.m[0] = r.m[5] = r.m[10] = r.m[15] = 1.0;
  return r;
}

Mat4 mul(const Mat4& a, const Mat4& b) {
  Mat4 r{};
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) {
      double s = 0;
      for (int k = 0; k < 4; ++k) s += a[i][k] * b[k][j];
      r[i][j] = s;
    }
  return r;
}

Mat4 inv_rigid(const Mat4& a) {
  // inverse of a rigid transform: R^T, -R^T t
  Mat4 r = identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r[i][j] = a[j][i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += r[i][j] * a[j][3];
    r[i][3] = -s;
  }
  return r;
}

void hat3(const double w[3], double k[9]) {
  k[0] = 0;     k[1] = -w[2]; k[2] = w[1];
  k[3] = w[2];  k[4] = 0;     k[5] = -w[0];
  k[6] = -w[1]; k[7] = w[0];  k[8] = 0;
}

// se(3) exp: xi = (v, w) -> 4x4
Mat4 exp_se3(const double xi[6]) {
  const double* v = xi;
  const double* w = xi + 3;
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double th = std::sqrt(th2);
  double A, B, C;
  if (th < 1e-8) {
    A = 1.0 - th2 / 6.0;
    B = 0.5 - th2 / 24.0;
    C = 1.0 / 6.0 - th2 / 120.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
    C = (1.0 - A) / th2;
  }
  double K[9], K2[9];
  hat3(w, K);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += K[3 * i + k] * K[3 * k + j];
      K2[3 * i + j] = s;
    }
  Mat4 r = identity();
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j)
      r[i][j] = (i == j) + A * K[3 * i + j] + B * K2[3 * i + j];
  // V = I + B K + C K^2
  double V[9];
  for (int i = 0; i < 9; ++i)
    V[i] = (i % 4 == 0) + B * K[i] + C * K2[i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += V[3 * i + j] * v[j];
    r[i][3] = s;
  }
  return r;
}

// SO(3) log
void log_so3(const Mat4& m, double w[3]) {
  double tr = m[0][0] + m[1][1] + m[2][2];
  double cos_th = std::fmin(1.0, std::fmax(-1.0, (tr - 1.0) * 0.5));
  double th = std::acos(cos_th);
  double s = (th < 1e-8) ? 0.5 + th * th / 12.0 : th / (2.0 * std::sin(th));
  w[0] = s * (m[2][1] - m[1][2]);
  w[1] = s * (m[0][2] - m[2][0]);
  w[2] = s * (m[1][0] - m[0][1]);
}

// se(3) log: 4x4 -> (v, w)
void log_se3(const Mat4& m, double xi[6]) {
  double* v = xi;
  double* w = xi + 3;
  log_so3(m, w);
  double th2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2];
  double th = std::sqrt(th2);
  double K[9], K2[9];
  hat3(w, K);
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += K[3 * i + k] * K[3 * k + j];
      K2[3 * i + j] = s;
    }
  double A, B, coef;
  if (th < 1e-8) {
    coef = 1.0 / 12.0 + th2 / 720.0;
  } else {
    A = std::sin(th) / th;
    B = (1.0 - std::cos(th)) / th2;
    coef = (1.0 - A / (2.0 * B)) / th2;
  }
  // V^{-1} = I - 0.5 K + coef K^2
  double Vi[9];
  for (int i = 0; i < 9; ++i)
    Vi[i] = (i % 4 == 0) - 0.5 * K[i] + coef * K2[i];
  for (int i = 0; i < 3; ++i) {
    double s = 0;
    for (int j = 0; j < 3; ++j) s += Vi[3 * i + j] * m[j][3];
    v[i] = s;
  }
}

// dense Cholesky solve (LL^T), in place; returns false if not SPD
bool cholesky_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        A[i * n + i] = std::sqrt(s);
      } else {
        A[i * n + j] = s / A[j * n + j];
      }
    }
  }
  for (int i = 0; i < n; ++i) {  // forward
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {  // backward
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

// numerical Jacobian of the edge residual w.r.t. the two poses'
// right-multiplied local increments (6 cols each)
void edge_residual(const Mat4& xi_inv_xj, const Mat4& z_inv, double r[6]) {
  Mat4 e = mul(z_inv, xi_inv_xj);
  log_se3(e, r);
}

}  // namespace

extern "C" {

// poses:   [K, 16] row-major 4x4 (column-vector convention), updated in place
// edges:   [E, 2] int32 (i, j)
// zs:      [E, 16] measured T_ij = X_i^{-1} X_j
// weights: [E]
// Returns final total squared error; -1.0 on failure.
double pose_graph_optimize(double* poses, int num_poses,
                           const int32_t* edges, const double* zs,
                           const double* weights, int num_edges,
                           int iters, double damping) {
  const int k = num_poses;
  if (k < 2 || num_edges < 1) return -1.0;
  const int n = 6 * (k - 1);  // pose 0 fixed
  std::vector<Mat4> x(k);
  for (int i = 0; i < k; ++i) std::memcpy(x[i].m, poses + 16 * i, 128);
  std::vector<Mat4> z_inv(num_edges);
  for (int e = 0; e < num_edges; ++e) {
    Mat4 z;
    std::memcpy(z.m, zs + 16 * e, 128);
    z_inv[e] = inv_rigid(z);
  }

  double total = 0;
  std::vector<double> H(n * n), g(n), Ji(36), Jj(36);
  for (int it = 0; it < iters; ++it) {
    std::fill(H.begin(), H.end(), 0.0);
    std::fill(g.begin(), g.end(), 0.0);
    total = 0;
    for (int e = 0; e < num_edges; ++e) {
      int i = edges[2 * e], j = edges[2 * e + 1];
      double w = weights[e];
      Mat4 xi_inv = inv_rigid(x[i]);
      Mat4 rel = mul(xi_inv, x[j]);
      double r0[6];
      edge_residual(rel, z_inv[e], r0);
      for (int d = 0; d < 6; ++d) total += w * r0[d] * r0[d];

      const double eps = 1e-6;
      for (int c = 0; c < 6; ++c) {
        double xi6[6] = {0, 0, 0, 0, 0, 0};
        xi6[c] = eps;
        Mat4 d4 = exp_se3(xi6);
        double rp[6];
        // perturb X_j: X_j' = X_j * exp(e_c)
        edge_residual(mul(rel, d4), z_inv[e], rp);
        for (int d = 0; d < 6; ++d) Jj[6 * d + c] = (rp[d] - r0[d]) / eps;
        // perturb X_i: X_i' = X_i * exp(e_c)  =>  rel' = exp(-e_c) * rel
        xi6[c] = -eps;
        Mat4 d4i = exp_se3(xi6);
        edge_residual(mul(d4i, rel), z_inv[e], rp);
        for (int d = 0; d < 6; ++d) Ji[6 * d + c] = (rp[d] - r0[d]) / eps;
      }
      // accumulate H += w J^T J, g += w J^T r for the two blocks
      int bi = 6 * (i - 1), bj = 6 * (j - 1);
      for (int a = 0; a < 6; ++a) {
        for (int b = 0; b < 6; ++b) {
          double hii = 0, hjj = 0, hij = 0;
          for (int d = 0; d < 6; ++d) {
            hii += Ji[6 * d + a] * Ji[6 * d + b];
            hjj += Jj[6 * d + a] * Jj[6 * d + b];
            hij += Ji[6 * d + a] * Jj[6 * d + b];
          }
          if (i > 0) H[(bi + a) * n + bi + b] += w * hii;
          if (j > 0) H[(bj + a) * n + bj + b] += w * hjj;
          if (i > 0 && j > 0) {
            H[(bi + a) * n + bj + b] += w * hij;
            H[(bj + b) * n + bi + a] += w * hij;
          }
        }
        double gi = 0, gj = 0;
        for (int d = 0; d < 6; ++d) {
          gi += Ji[6 * d + a] * r0[d];
          gj += Jj[6 * d + a] * r0[d];
        }
        if (i > 0) g[bi + a] += w * gi;
        if (j > 0) g[bj + a] += w * gj;
      }
    }
    for (int d = 0; d < n; ++d) H[d * n + d] += damping;
    std::vector<double> rhs(n);
    for (int d = 0; d < n; ++d) rhs[d] = -g[d];
    std::vector<double> Hc = H;
    if (!cholesky_solve(Hc, rhs, n)) return -1.0;
    for (int p = 1; p < k; ++p) {
      Mat4 d4 = exp_se3(&rhs[6 * (p - 1)]);
      x[p] = mul(x[p], d4);
    }
  }
  for (int i = 0; i < k; ++i) std::memcpy(poses + 16 * i, x[i].m, 128);
  return total;
}

}  // extern "C"
