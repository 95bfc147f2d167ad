// Reference-algorithm FILTER: a fresh C++17/OpenMP implementation of the
// complete per-scan pipeline of LimHaeryong/ESKF_LIO, run end-to-end on the
// exact sequence the TPU bench uses (exported via
// eskf_lio_tpu.io.dataset.save_seq_bin).  Two purposes:
//
//  1. It produces the REFERENCE-ALGORITHM TRAJECTORY for the bench's
//     "ATE vs reference trajectory" metric (BASELINE.md): the reference
//     itself cannot run here (no ROS2/Open3D/Hilti bag), so its algorithm
//     is re-implemented fresh and driven by the same data.
//  2. Its wall-clock is the measured scans/s baseline DENOMINATOR on this
//     host (replacing the synthetic-cloud cost probe ref_baseline.cpp and
//     the hard-coded constants it produced).
//
// Algorithmic parity, stage by stage (reference file:line):
//   * ESKF IMU propagation: nominal p/v/q integration + 18x18
//     P <- Fx P Fx^T + Fi Qi Fi^T with the reference's F blocks
//     (ErrorStateKF.cpp:76-113); error ordering [p v theta ba bg g]
//     (Types.hpp:31-52).
//   * Block-wise deskew: points between consecutive IMU states share the
//     earlier state's pose, cloud re-expressed in the scan-end body frame
//     via T_end^-1 T_state (CloudPreprocessor.cpp:25-74).
//   * Voxel downsample: first point per 0.3 m voxel through a sequential
//     hash map (CloudPreprocessor.cpp:85-99).
//   * Per-point covariance: grid 27-neighbourhood moments + SVD
//     plane-regularisation to U diag(1,1,1e-2) V^T
//     (CloudPreprocessor.cpp:103-124; the grid gather stands in for the
//     reference's KD-tree KNN(30) — cheaper, so the measured scans/s
//     over-estimates the reference, a conservative denominator).
//   * VGICP Gauss-Newton: per-point own-voxel lookup (LocalMap.cpp:78-109),
//     W = (R S_src R^T + S_vox)^-1 full 3x3 inverse, J = [I | -[p]x],
//     6x6 solve, left-compose, convergence cos>=0.9999 && |t|^2<=1e-6,
//     re-matching EVERY iteration (Registration.cpp:7-102).
//   * ESKF 6-DoF update: residual [t_icp - p, Log(R^T R_icp)],
//     K = P H^T (H P H^T + V)^-1, P <- (I-KH)P, inject, reset with
//     G[theta] = I - 1/2 [dtheta]x (ErrorStateKF.cpp:115-180).
//   * Map: per-voxel running mean + running mean-of-covariances capped at
//     1000 points (LocalMap.hpp:63-89), motion-gated insertion
//     (LocalMap.cpp:132-147), distant-voxel eviction every 10 s of SENSOR
//     time (LocalMap.cpp:60-72; the reference uses wall clock - the
//     deliberate reproducibility deviation documented in SURVEY 5.6a).
//
// Build:  make -C native ref_filter
// Run:    native/ref_filter seq.bin traj.bin [v_trans] [v_rot]
// Prints one JSON line with scans/s + per-stage ms; writes the trajectory
// as  i64 n; f64 t[n]; f64 xyz[n][3]  to traj.bin.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <unordered_map>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

static double now_s() {
#ifdef _OPENMP
  return omp_get_wtime();
#else
  return (double)clock() / CLOCKS_PER_SEC;
#endif
}

// ---------------------------------------------------------------------------
// small linear algebra (flat arrays; no Eigen)
// ---------------------------------------------------------------------------

typedef double M3[9];   // row-major 3x3
typedef double V3[3];

static inline void m3_ident(M3 a) {
  for (int i = 0; i < 9; ++i) a[i] = 0;
  a[0] = a[4] = a[8] = 1;
}
static inline void m3_mul(const M3 a, const M3 b, M3 c) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[3 * i + k] * b[3 * k + j];
      c[3 * i + j] = s;
    }
}
static inline void m3_tmul(const M3 a, const M3 b, M3 c) {  // a^T b
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[3 * k + i] * b[3 * k + j];
      c[3 * i + j] = s;
    }
}
static inline void m3_apply(const M3 a, const V3 x, V3 y) {
  for (int i = 0; i < 3; ++i)
    y[i] = a[3 * i] * x[0] + a[3 * i + 1] * x[1] + a[3 * i + 2] * x[2];
}
static inline void m3_tapply(const M3 a, const V3 x, V3 y) {
  for (int i = 0; i < 3; ++i)
    y[i] = a[i] * x[0] + a[3 + i] * x[1] + a[6 + i] * x[2];
}

// quaternion wxyz
static inline void quat_ident(double q[4]) { q[0] = 1; q[1] = q[2] = q[3] = 0; }
static inline void quat_mul(const double a[4], const double b[4], double c[4]) {
  c[0] = a[0] * b[0] - a[1] * b[1] - a[2] * b[2] - a[3] * b[3];
  c[1] = a[0] * b[1] + a[1] * b[0] + a[2] * b[3] - a[3] * b[2];
  c[2] = a[0] * b[2] - a[1] * b[3] + a[2] * b[0] + a[3] * b[1];
  c[3] = a[0] * b[3] + a[1] * b[2] - a[2] * b[1] + a[3] * b[0];
}
static inline void quat_normalize(double q[4]) {
  double n = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  for (int i = 0; i < 4; ++i) q[i] /= n;
}
static inline void quat_exp(const V3 w, double q[4]) {  // exp of w (rotvec)
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  if (th < 1e-12) {
    q[0] = 1; q[1] = 0.5 * w[0]; q[2] = 0.5 * w[1]; q[3] = 0.5 * w[2];
  } else {
    double s = std::sin(0.5 * th) / th;
    q[0] = std::cos(0.5 * th);
    q[1] = s * w[0]; q[2] = s * w[1]; q[3] = s * w[2];
  }
  quat_normalize(q);
}
static inline void quat_to_mat(const double q[4], M3 R) {
  double w = q[0], x = q[1], y = q[2], z = q[3];
  R[0] = 1 - 2 * (y * y + z * z); R[1] = 2 * (x * y - w * z); R[2] = 2 * (x * z + w * y);
  R[3] = 2 * (x * y + w * z); R[4] = 1 - 2 * (x * x + z * z); R[5] = 2 * (y * z - w * x);
  R[6] = 2 * (x * z - w * y); R[7] = 2 * (y * z + w * x); R[8] = 1 - 2 * (x * x + y * y);
}
static inline void so3_log(const M3 R, V3 w) {
  double tr = R[0] + R[4] + R[8];
  double c = 0.5 * (tr - 1.0);
  c = c > 1 ? 1 : (c < -1 ? -1 : c);
  double th = std::acos(c);
  double s = std::sin(th);
  double k = (std::fabs(s) < 1e-9) ? 0.5 : 0.5 * th / s;
  w[0] = k * (R[7] - R[5]);
  w[1] = k * (R[2] - R[6]);
  w[2] = k * (R[3] - R[1]);
}
static inline void so3_exp(const V3 w, M3 R) {
  double q[4];
  quat_exp(w, q);
  quat_to_mat(q, R);
}
// slerp between two quats (shortest arc), u in [0,1]
static void quat_slerp(const double a[4], const double b0[4], double u,
                       double out[4]) {
  double b[4] = {b0[0], b0[1], b0[2], b0[3]};
  double d = a[0] * b[0] + a[1] * b[1] + a[2] * b[2] + a[3] * b[3];
  if (d < 0) { for (int i = 0; i < 4; ++i) b[i] = -b[i]; d = -d; }
  if (d > 0.9995) {
    for (int i = 0; i < 4; ++i) out[i] = a[i] + u * (b[i] - a[i]);
  } else {
    double th = std::acos(d), s = std::sin(th);
    double wa = std::sin((1 - u) * th) / s, wb = std::sin(u * th) / s;
    for (int i = 0; i < 4; ++i) out[i] = wa * a[i] + wb * b[i];
  }
  quat_normalize(out);
}

// symmetric 3x3 inverse via adjugate
static inline void sym3_inv(const double s[6], M3 inv) {
  double a = s[0], b = s[1], c = s[2], d = s[3], e = s[4], f = s[5];
  double ca = d * f - e * e, cb = c * e - b * f, cc = b * e - c * d;
  double det = a * ca + b * cb + c * cc;
  double id = 1.0 / (det != 0 ? det : 1e-30);
  inv[0] = ca * id; inv[1] = cb * id; inv[2] = cc * id;
  inv[3] = cb * id; inv[4] = (a * f - c * c) * id; inv[5] = (b * c - a * e) * id;
  inv[6] = cc * id; inv[7] = (b * c - a * e) * id; inv[8] = (a * d - b * b) * id;
}

// Jacobi eigendecomposition of a symmetric 3x3 (packed xx xy xz yy yz zz);
// returns eigenvalues desc in w[3] and column eigenvectors in V (row-major)
static void sym3_eig(const double s[6], double w[3], M3 V) {
  double A[9] = {s[0], s[1], s[2], s[1], s[3], s[4], s[2], s[4], s[5]};
  m3_ident(V);
  for (int sweep = 0; sweep < 16; ++sweep) {
    double off = std::fabs(A[1]) + std::fabs(A[2]) + std::fabs(A[5]);
    if (off < 1e-14) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        double apq = A[3 * p + q];
        if (std::fabs(apq) < 1e-18) continue;
        double app = A[3 * p + p], aqq = A[3 * q + q];
        double phi = 0.5 * std::atan2(2 * apq, aqq - app);
        double c = std::cos(phi), t = std::sin(phi);
        for (int k = 0; k < 3; ++k) {
          double akp = A[3 * k + p], akq = A[3 * k + q];
          A[3 * k + p] = c * akp - t * akq;
          A[3 * k + q] = t * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          double apk = A[3 * p + k], aqk = A[3 * q + k];
          A[3 * p + k] = c * apk - t * aqk;
          A[3 * q + k] = t * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          double vkp = V[3 * k + p], vkq = V[3 * k + q];
          V[3 * k + p] = c * vkp - t * vkq;
          V[3 * k + q] = t * vkp + c * vkq;
        }
      }
  }
  int idx[3] = {0, 1, 2};
  double ev[3] = {A[0], A[4], A[8]};
  for (int i = 0; i < 2; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (ev[idx[j]] > ev[idx[i]]) { int t = idx[i]; idx[i] = idx[j]; idx[j] = t; }
  M3 Vs;
  for (int k = 0; k < 3; ++k) {
    w[k] = ev[idx[k]];
    for (int r = 0; r < 3; ++r) Vs[3 * r + k] = V[3 * r + idx[k]];
  }
  std::memcpy(V, Vs, sizeof(M3));
}

// dense NxN solve (partial pivot); N = 6 or 18-scale helpers
template <int N>
static void solveN(double A[N][N], double b[N], double x[N]) {
  int piv[N];
  for (int i = 0; i < N; ++i) piv[i] = i;
  for (int col = 0; col < N; ++col) {
    int best = col;
    for (int r = col + 1; r < N; ++r)
      if (std::fabs(A[r][col]) > std::fabs(A[best][col])) best = r;
    if (best != col) {
      for (int k = 0; k < N; ++k) std::swap(A[col][k], A[best][k]);
      std::swap(b[col], b[best]);
    }
    double d = A[col][col];
    if (std::fabs(d) < 1e-30) d = 1e-30;
    for (int r = col + 1; r < N; ++r) {
      double f = A[r][col] / d;
      if (f == 0) continue;
      for (int k = col; k < N; ++k) A[r][k] -= f * A[col][k];
      b[r] -= f * b[col];
    }
  }
  for (int r = N - 1; r >= 0; --r) {
    double s = b[r];
    for (int k = r + 1; k < N; ++k) s -= A[r][k] * x[k];
    x[r] = s / (std::fabs(A[r][r]) < 1e-30 ? 1e-30 : A[r][r]);
  }
  (void)piv;
}

// ---------------------------------------------------------------------------
// voxel map (running mean + running mean-of-covariances, cap 1000)
// ---------------------------------------------------------------------------

struct Voxel {
  int n = 0;
  V3 mean = {0, 0, 0};
  double cov[6] = {0, 0, 0, 0, 0, 0};
};

struct KeyHash {
  size_t operator()(const int64_t& k) const {
    return std::hash<int64_t>()((int64_t)((uint64_t)k * 0x9E3779B97F4A7C15ull));
  }
};
using VoxMap = std::unordered_map<int64_t, Voxel, KeyHash>;

static inline int64_t key3(int64_t ix, int64_t iy, int64_t iz) {
  return ((ix + (1 << 20)) << 42) | ((iy + (1 << 20)) << 21) | (iz + (1 << 20));
}
static inline int64_t key_of(const V3 p, double inv_vs) {
  return key3((int64_t)std::floor(p[0] * inv_vs),
              (int64_t)std::floor(p[1] * inv_vs),
              (int64_t)std::floor(p[2] * inv_vs));
}

// ---------------------------------------------------------------------------
// 18x18 ESKF
// ---------------------------------------------------------------------------

struct State {
  V3 p = {0, 0, 0};
  V3 v = {0, 0, 0};
  double q[4];  // wxyz
  V3 ba = {0, 0, 0};
  V3 bg = {0, 0, 0};
  V3 g = {0, 0, -9.81};
  double P[18][18];
  State() {
    quat_ident(q);
    std::memset(P, 0, sizeof(P));
    for (int i = 0; i < 18; ++i) P[i][i] = 1e-3;
  }
};

// q_diag: [sigma2_an(3), sigma2_gn(3), sigma2_aw(3), sigma2_gw(3)]
static void eskf_predict(State& s, double dt, const V3 gyro, const V3 accel,
                         const double q_diag[12]) {
  if (dt < 0) return;  // ref drops negative-dt samples (ErrorStateKF.cpp:80)
  M3 R;
  quat_to_mat(s.q, R);
  V3 a = {accel[0] - s.ba[0], accel[1] - s.ba[1], accel[2] - s.ba[2]};
  V3 w = {gyro[0] - s.bg[0], gyro[1] - s.bg[1], gyro[2] - s.bg[2]};
  V3 Ra;
  m3_apply(R, a, Ra);
  V3 acc_w = {Ra[0] + s.g[0], Ra[1] + s.g[1], Ra[2] + s.g[2]};

  for (int i = 0; i < 3; ++i) {
    s.p[i] += s.v[i] * dt + 0.5 * acc_w[i] * dt * dt;
    s.v[i] += acc_w[i] * dt;
  }
  V3 wdt = {w[0] * dt, w[1] * dt, w[2] * dt};
  double dq[4], qn[4];
  quat_exp(wdt, dq);
  quat_mul(s.q, dq, qn);
  std::memcpy(s.q, qn, sizeof(qn));
  quat_normalize(s.q);

  // F blocks (ErrorStateKF.cpp:101-107), error order [p v theta ba bg g]
  double F[18][18];
  std::memset(F, 0, sizeof(F));
  for (int i = 0; i < 18; ++i) F[i][i] = 1;
  M3 Sa = {0, -a[2], a[1], a[2], 0, -a[0], -a[1], a[0], 0};
  M3 RSa;
  m3_mul(R, Sa, RSa);
  M3 dqm;
  double dqc[4] = {dq[0], -dq[1], -dq[2], -dq[3]};
  quat_to_mat(dqc, dqm);
  for (int i = 0; i < 3; ++i) {
    F[i][3 + i] = dt;
    for (int j = 0; j < 3; ++j) {
      F[3 + i][6 + j] = -RSa[3 * i + j] * dt;
      F[3 + i][9 + j] = -R[3 * i + j] * dt;
      F[6 + i][6 + j] = dqm[3 * i + j];
    }
    F[3 + i][15 + i] = dt;
    F[6 + i][12 + i] = -dt;
  }

  double T[18][18];
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 18; ++j) {
      double acc = 0;
      for (int k = 0; k < 18; ++k) acc += F[i][k] * s.P[k][j];
      T[i][j] = acc;
    }
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 18; ++j) {
      double acc = 0;
      for (int k = 0; k < 18; ++k) acc += T[i][k] * F[j][k];
      s.P[i][j] = acc;
    }
  // Fi Qi Fi^T: diagonal on rows 3..14; accel/gyro-noise blocks scale dt^2,
  // walk blocks dt (ErrorStateKF.cpp:98-109)
  for (int i = 0; i < 6; ++i) s.P[3 + i][3 + i] += q_diag[i] * dt * dt;
  for (int i = 0; i < 6; ++i) s.P[9 + i][9 + i] += q_diag[6 + i] * dt;
  // keep symmetric
  for (int i = 0; i < 18; ++i)
    for (int j = i + 1; j < 18; ++j) {
      double m = 0.5 * (s.P[i][j] + s.P[j][i]);
      s.P[i][j] = s.P[j][i] = m;
    }
}

static void eskf_update(State& s, const M3 R_icp, const V3 t_icp,
                        const double v_diag[6]) {
  M3 Rs;
  quat_to_mat(s.q, Rs);
  M3 dR;
  m3_tmul(Rs, R_icp, dR);
  V3 dth;
  so3_log(dR, dth);
  double resid[6] = {t_icp[0] - s.p[0], t_icp[1] - s.p[1], t_icp[2] - s.p[2],
                     dth[0], dth[1], dth[2]};
  // H selects rows (0:3, 6:9)
  const int sel[6] = {0, 1, 2, 6, 7, 8};
  double PHt[18][6];
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 6; ++j) PHt[i][j] = s.P[i][sel[j]];
  double S[6][6];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j)
      S[i][j] = PHt[sel[i]][j] + (i == j ? v_diag[i] : 0.0);
  // K = PHt S^-1  (solve S^T X^T = PHt^T column-wise; S symmetric)
  double K[18][6];
  for (int col = 0; col < 18; ++col) {
    double A[6][6], b[6], x[6];
    std::memcpy(A, S, sizeof(S));
    for (int j = 0; j < 6; ++j) b[j] = PHt[col][j];
    solveN<6>(A, b, x);
    for (int j = 0; j < 6; ++j) K[col][j] = x[j];
  }
  double err[18];
  for (int i = 0; i < 18; ++i) {
    double acc = 0;
    for (int j = 0; j < 6; ++j) acc += K[i][j] * resid[j];
    err[i] = acc;
  }
  // P <- (I - K H) P   (Joseph form not used, ErrorStateKF.cpp:140-142)
  double KHP[18][18];
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 18; ++j) {
      double acc = 0;
      for (int k = 0; k < 6; ++k) acc += K[i][k] * s.P[sel[k]][j];
      KHP[i][j] = acc;
    }
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 18; ++j) s.P[i][j] -= KHP[i][j];

  // inject (ErrorStateKF.cpp:164-172)
  for (int i = 0; i < 3; ++i) {
    s.p[i] += err[i];
    s.v[i] += err[3 + i];
    s.ba[i] += err[9 + i];
    s.bg[i] += err[12 + i];
    s.g[i] += err[15 + i];
  }
  V3 dte = {err[6], err[7], err[8]};
  double dq[4], qn[4];
  quat_exp(dte, dq);
  quat_mul(s.q, dq, qn);
  std::memcpy(s.q, qn, sizeof(qn));
  quat_normalize(s.q);

  // reset: P <- G P G^T with G[theta] = I - 1/2 [dtheta]x
  // (ErrorStateKF.cpp:174-180) — only the theta block differs from I
  M3 Gt = {1, 0.5 * dte[2], -0.5 * dte[1],
           -0.5 * dte[2], 1, 0.5 * dte[0],
           0.5 * dte[1], -0.5 * dte[0], 1};
  double Pn[18][18];
  std::memcpy(Pn, s.P, sizeof(Pn));
  for (int j = 0; j < 18; ++j)
    for (int i = 0; i < 3; ++i) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += Gt[3 * i + k] * s.P[6 + k][j];
      Pn[6 + i][j] = acc;
    }
  std::memcpy(s.P, Pn, sizeof(Pn));
  for (int i = 0; i < 18; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0;
      for (int k = 0; k < 3; ++k) acc += Pn[i][6 + k] * Gt[3 * j + k];
      s.P[i][6 + j] = acc;
    }
  for (int i = 0; i < 18; ++i)
    for (int j = i + 1; j < 18; ++j) {
      double m = 0.5 * (s.P[i][j] + s.P[j][i]);
      s.P[i][j] = s.P[j][i] = m;
    }
}

// ---------------------------------------------------------------------------
// main pipeline
// ---------------------------------------------------------------------------

struct Seq {
  int64_t n_imu, n_scans, total_pts;
  std::vector<double> imu_t, imu_gyro, imu_accel;
  std::vector<int64_t> offsets;
  std::vector<double> scan_end_t, scan_t;
  std::vector<float> scan_xyz;
};

static bool load_seq(const char* path, Seq& s) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "ESKFSEQ1", 8)) {
    std::fclose(f);
    return false;
  }
  int64_t hdr[3];
  if (std::fread(hdr, 8, 3, f) != 3) { std::fclose(f); return false; }
  s.n_imu = hdr[0]; s.n_scans = hdr[1]; s.total_pts = hdr[2];
  auto rd = [&](void* dst, size_t n) {
    return std::fread(dst, 1, n, f) == n;
  };
  s.imu_t.resize(s.n_imu);
  s.imu_gyro.resize(3 * s.n_imu);
  s.imu_accel.resize(3 * s.n_imu);
  s.offsets.resize(s.n_scans + 1);
  s.scan_end_t.resize(s.n_scans);
  bool ok = rd(s.imu_t.data(), 8 * s.n_imu) &&
            rd(s.imu_gyro.data(), 24 * s.n_imu) &&
            rd(s.imu_accel.data(), 24 * s.n_imu) &&
            rd(s.offsets.data(), 8 * (s.n_scans + 1)) &&
            rd(s.scan_end_t.data(), 8 * s.n_scans);
  s.scan_t.resize(s.total_pts);
  s.scan_xyz.resize(3 * s.total_pts);
  ok = ok && rd(s.scan_t.data(), 8 * s.total_pts) &&
       rd(s.scan_xyz.data(), 12 * s.total_pts);
  std::fclose(f);
  return ok;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: ref_filter seq.bin traj.bin [v_t] [v_r]\n");
    return 2;
  }
  Seq seq;
  if (!load_seq(argv[1], seq)) {
    std::fprintf(stderr, "cannot read %s\n", argv[1]);
    return 2;
  }
  // measurement noise: same calibration the bench config uses (the
  // reference ships 1e-6 which our round-2 analysis showed oscillates;
  // giving the reference algorithm the tuned values is the
  // reference-favourable choice)
  const double v_t = argc > 3 ? atof(argv[3]) : 1e-3;
  const double v_r = argc > 4 ? atof(argv[4]) : 3e-4;
  const double v_diag[6] = {v_t, v_t, v_t, v_r, v_r, v_r};
  // process noise from the Hilti datasheet values exactly as
  // ErrorStateKF.cpp:30-41 converts them (rate 400 Hz)
  const double rate = 400.0, srate = std::sqrt(rate);
  const double san[3] = {105e-6 * 9.81 * srate, 105e-6 * 9.81 * srate,
                         135e-6 * 9.81 * srate};
  const double sgn = 0.014 * srate * M_PI / 180.0;
  const double saw = 20e-3 * srate * 9.81;
  const double sgw = 1.0 * srate * M_PI / 180.0;
  double q_diag[12];
  for (int i = 0; i < 3; ++i) {
    q_diag[i] = san[i] * san[i];
    q_diag[3 + i] = sgn * sgn;
    q_diag[6 + i] = saw * saw;
    q_diag[9 + i] = sgw * sgw;
  }

  const double VS = 0.3, INV_VS = 1.0 / VS;
  const int MAX_PPV = 1000, MAX_ITERS = 100;
  const double COS_THR = 0.9999, TSQ_THR = 1e-6;
  const double GATE_TSQ = 1e-2, GATE_COS = 0.985;
  const double EVICT_DIST = 100.0, EVICT_PERIOD = 10.0;

  State st;
  st.g[2] = -9.81;
  VoxMap map;
  map.reserve(1 << 20);

  std::vector<double> traj_t, traj_xyz;
  double t_prop = 0, t_desk = 0, t_down = 0, t_cov = 0, t_gn = 0, t_upd = 0,
         t_ins = 0;
  double t_total0 = now_s();
  int64_t imu_i = 0;
  int gn_iters_total = 0;

  // last inserted pose for the motion gate (LocalMap.cpp:132-147)
  M3 last_R;
  m3_ident(last_R);
  V3 last_t = {0, 0, 0};
  double t_last_evict = seq.scan_end_t[0];

  for (int64_t k = 0; k < seq.n_scans; ++k) {
    const double t_end = seq.scan_end_t[k];
    const int64_t p0 = seq.offsets[k], p1 = seq.offsets[k + 1];
    const int64_t npts = p1 - p0;

    if (k == 0) {
      // first frame: downsample + insert at identity, drop older IMU
      // (Odometry.cpp:55-63, ErrorStateKF.cpp:66-69)
      while (imu_i < seq.n_imu && seq.imu_t[imu_i] <= t_end) ++imu_i;
      VoxMap first;
      first.reserve(npts);
      for (int64_t i = p0; i < p1; ++i) {
        V3 p = {seq.scan_xyz[3 * i], seq.scan_xyz[3 * i + 1],
                seq.scan_xyz[3 * i + 2]};
        int64_t key = key_of(p, INV_VS);
        if (first.emplace(key, Voxel{}).second) {
          Voxel& v = map[key];
          double n1 = v.n + 1;
          for (int d = 0; d < 3; ++d) v.mean[d] += (p[d] - v.mean[d]) / n1;
          v.n = (int)n1;
        }
      }
      traj_t.push_back(t_end);
      traj_xyz.insert(traj_xyz.end(), {0.0, 0.0, 0.0});
      continue;
    }

    // ---- 1. propagate through IMU <= t_end, record state history --------
    double t0 = now_s();
    std::vector<double> h_t;
    std::vector<double> h_q;   // 4 per state
    std::vector<double> h_p;   // 3 per state
    h_t.push_back(seq.imu_t[imu_i > 0 ? imu_i - 1 : 0]);
    h_q.insert(h_q.end(), st.q, st.q + 4);
    h_p.insert(h_p.end(), st.p, st.p + 3);
    double prev_t = h_t[0];
    while (imu_i < seq.n_imu && seq.imu_t[imu_i] <= t_end) {
      double dt = seq.imu_t[imu_i] - prev_t;
      eskf_predict(st, dt, &seq.imu_gyro[3 * imu_i], &seq.imu_accel[3 * imu_i],
                   q_diag);
      prev_t = seq.imu_t[imu_i];
      h_t.push_back(prev_t);
      h_q.insert(h_q.end(), st.q, st.q + 4);
      h_p.insert(h_p.end(), st.p, st.p + 3);
      ++imu_i;
    }
    t_prop += now_s() - t0;

    // ---- 2. block-wise deskew into the scan-end body frame --------------
    // (CloudPreprocessor.cpp:25-74): pose at t_end by slerp/lerp of the
    // bracketing states, points between states share the earlier pose
    t0 = now_s();
    const int ns = (int)h_t.size();
    double q_end[4];
    V3 p_end;
    {
      int j = ns - 1;  // last state <= t_end (== t_end when aligned)
      if (h_t[j] >= t_end || j + 1 >= ns) {
        std::memcpy(q_end, &h_q[4 * j], 4 * sizeof(double));
        std::memcpy(p_end, &h_p[3 * j], 3 * sizeof(double));
      } else {
        double u = (t_end - h_t[j]) / (h_t[j + 1] - h_t[j]);
        quat_slerp(&h_q[4 * j], &h_q[4 * (j + 1)], u, q_end);
        for (int d = 0; d < 3; ++d)
          p_end[d] = (1 - u) * h_p[3 * j + d] + u * h_p[3 * (j + 1) + d];
      }
    }
    M3 R_end;
    quat_to_mat(q_end, R_end);
    std::vector<double> body(3 * npts);
    {
      // per state block: T_end^-1 T_state applied to points with
      // t in [state_j, state_{j+1})
      int j = 0;
      M3 R_s, Rrel;
      V3 t_rel;
      auto compose = [&](int jj) {
        quat_to_mat(&h_q[4 * jj], R_s);
        m3_tmul(R_end, R_s, Rrel);  // R_end^T R_state
        V3 dp = {h_p[3 * jj] - p_end[0], h_p[3 * jj + 1] - p_end[1],
                 h_p[3 * jj + 2] - p_end[2]};
        m3_tapply(R_end, dp, t_rel);
      };
      compose(0);
      for (int64_t i = 0; i < npts; ++i) {
        double tp = seq.scan_t[p0 + i];
        while (j + 1 < ns && h_t[j + 1] <= tp) { ++j; compose(j); }
        V3 p = {seq.scan_xyz[3 * (p0 + i)], seq.scan_xyz[3 * (p0 + i) + 1],
                seq.scan_xyz[3 * (p0 + i) + 2]};
        V3 o;
        m3_apply(Rrel, p, o);
        body[3 * i] = o[0] + t_rel[0];
        body[3 * i + 1] = o[1] + t_rel[1];
        body[3 * i + 2] = o[2] + t_rel[2];
      }
    }
    t_desk += now_s() - t0;

    // ---- 3. downsample: first point per voxel ---------------------------
    t0 = now_s();
    VoxMap first;
    first.reserve(npts);
    std::vector<int64_t> kept;
    kept.reserve(npts / 3);
    for (int64_t i = 0; i < npts; ++i) {
      V3 p = {body[3 * i], body[3 * i + 1], body[3 * i + 2]};
      if (first.emplace(key_of(p, INV_VS), Voxel{}).second) kept.push_back(i);
    }
    const int nk = (int)kept.size();
    t_down += now_s() - t0;

    // ---- 4. per-point covariance (grid 27-neighbourhood + SVD plane) ----
    t0 = now_s();
    std::unordered_map<int64_t, std::vector<int>, KeyHash> bins;
    bins.reserve(2 * nk);
    for (int64_t i = 0; i < npts; ++i) {
      V3 p = {body[3 * i], body[3 * i + 1], body[3 * i + 2]};
      bins[key_of(p, INV_VS)].push_back((int)i);
    }
    std::vector<double> covs(6 * nk);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int i = 0; i < nk; ++i) {
      const int64_t pi = kept[i];
      V3 c = {body[3 * pi], body[3 * pi + 1], body[3 * pi + 2]};
      int64_t ix = (int64_t)std::floor(c[0] * INV_VS);
      int64_t iy = (int64_t)std::floor(c[1] * INV_VS);
      int64_t iz = (int64_t)std::floor(c[2] * INV_VS);
      double m[3] = {0, 0, 0}, c2[6] = {0, 0, 0, 0, 0, 0};
      int n = 0;
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz) {
            auto it = bins.find(key3(ix + dx, iy + dy, iz + dz));
            if (it == bins.end()) continue;
            for (int jj : it->second) {
              const double* qp = &body[3 * jj];
              m[0] += qp[0]; m[1] += qp[1]; m[2] += qp[2];
              c2[0] += qp[0] * qp[0]; c2[1] += qp[0] * qp[1];
              c2[2] += qp[0] * qp[2]; c2[3] += qp[1] * qp[1];
              c2[4] += qp[1] * qp[2]; c2[5] += qp[2] * qp[2];
              ++n;
            }
          }
      double inv = n > 0 ? 1.0 / n : 0.0;
      for (int d = 0; d < 3; ++d) m[d] *= inv;
      double raw[6] = {c2[0] * inv - m[0] * m[0], c2[1] * inv - m[0] * m[1],
                       c2[2] * inv - m[0] * m[2], c2[3] * inv - m[1] * m[1],
                       c2[4] * inv - m[1] * m[2], c2[5] * inv - m[2] * m[2]};
      // SVD plane regularisation to U diag(1,1,1e-2) U^T
      // (CloudPreprocessor.cpp:121-123)
      double w[3];
      M3 V;
      sym3_eig(raw, w, V);
      const double dvals[3] = {1.0, 1.0, 1e-2};
      double* out = &covs[6 * i];
      int idx6 = 0;
      for (int r = 0; r < 3; ++r)
        for (int cdx = r; cdx < 3; ++cdx) {
          double acc = 0;
          for (int kk = 0; kk < 3; ++kk)
            acc += V[3 * r + kk] * dvals[kk] * V[3 * cdx + kk];
          out[idx6++] = acc;
        }
    }
    t_cov += now_s() - t0;

    // ---- 5. VGICP Gauss-Newton (re-match every iteration) ---------------
    t0 = now_s();
    M3 R_tot;
    quat_to_mat(st.q, R_tot);
    V3 t_tot = {st.p[0], st.p[1], st.p[2]};
    int iters = 0;
    for (; iters < MAX_ITERS; ++iters) {
      double JTJ[6][6] = {{0}}, JTr[6] = {0};
      long ncorr = 0;
#ifdef _OPENMP
#pragma omp parallel
#endif
      {
        double jtj[6][6] = {{0}}, jtr[6] = {0};
        long nc = 0;
#ifdef _OPENMP
#pragma omp for schedule(static) nowait
#endif
        for (int i = 0; i < nk; ++i) {
          const double* bp = &body[3 * kept[i]];
          V3 pw;
          m3_apply(R_tot, bp, pw);
          for (int d = 0; d < 3; ++d) pw[d] += t_tot[d];
          auto it = map.find(key_of(pw, INV_VS));
          if (it == map.end() || it->second.n < 1) continue;
          const Voxel& v = it->second;
          // W = (R S_src R^T + S_vox)^-1 (Registration.cpp:95)
          const double* cs = &covs[6 * i];
          M3 Cs = {cs[0], cs[1], cs[2], cs[1], cs[3], cs[4],
                   cs[2], cs[4], cs[5]};
          M3 T1, RCsRt;
          m3_mul(R_tot, Cs, T1);
          // T1 * R^T
          for (int r = 0; r < 3; ++r)
            for (int cdx = 0; cdx < 3; ++cdx) {
              double acc = 0;
              for (int kk = 0; kk < 3; ++kk)
                acc += T1[3 * r + kk] * R_tot[3 * cdx + kk];
              RCsRt[3 * r + cdx] = acc;
            }
          double sum6[6] = {RCsRt[0] + v.cov[0], RCsRt[1] + v.cov[1],
                            RCsRt[2] + v.cov[2], RCsRt[4] + v.cov[3],
                            RCsRt[5] + v.cov[4], RCsRt[8] + v.cov[5]};
          M3 W;
          sym3_inv(sum6, W);
          V3 r = {pw[0] - v.mean[0], pw[1] - v.mean[1], pw[2] - v.mean[2]};
          // J = [I | -[pw]x]
          double J[3][6] = {{1, 0, 0, 0, pw[2], -pw[1]},
                            {0, 1, 0, -pw[2], 0, pw[0]},
                            {0, 0, 1, pw[1], -pw[0], 0}};
          double WJ[3][6];
          for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 6; ++b)
              WJ[a][b] = W[3 * a] * J[0][b] + W[3 * a + 1] * J[1][b] +
                         W[3 * a + 2] * J[2][b];
          for (int b = 0; b < 6; ++b) {
            double jt = J[0][b] * (W[0] * r[0] + W[1] * r[1] + W[2] * r[2]) +
                        J[1][b] * (W[3] * r[0] + W[4] * r[1] + W[5] * r[2]) +
                        J[2][b] * (W[6] * r[0] + W[7] * r[1] + W[8] * r[2]);
            jtr[b] += jt;
            for (int cdx = b; cdx < 6; ++cdx)
              jtj[b][cdx] += J[0][b] * WJ[0][cdx] + J[1][b] * WJ[1][cdx] +
                             J[2][b] * WJ[2][cdx];
          }
          ++nc;
        }
#ifdef _OPENMP
#pragma omp critical
#endif
        {
          ncorr += nc;
          for (int b = 0; b < 6; ++b) {
            JTr[b] += jtr[b];
            for (int cdx = b; cdx < 6; ++cdx) JTJ[b][cdx] += jtj[b][cdx];
          }
        }
      }
      if (ncorr < 6) break;
      for (int b = 0; b < 6; ++b)
        for (int cdx = 0; cdx < b; ++cdx) JTJ[b][cdx] = JTJ[cdx][b];
      double negJTr[6], xi[6];
      for (int b = 0; b < 6; ++b) negJTr[b] = -JTr[b];
      solveN<6>(JTJ, negJTr, xi);
      // left-compose exp([t, theta]) (Registration.cpp:19-20, se3 exp with
      // left Jacobian, Utils.cpp:40-63)
      V3 th = {xi[3], xi[4], xi[5]};
      M3 Rd;
      so3_exp(th, Rd);
      // left Jacobian J_l: t_delta = J_l * rho
      double an = std::sqrt(th[0] * th[0] + th[1] * th[1] + th[2] * th[2]);
      M3 Jl;
      m3_ident(Jl);
      M3 Sk = {0, -th[2], th[1], th[2], 0, -th[0], -th[1], th[0], 0};
      if (an > 1e-9) {
        double A = (1 - std::cos(an)) / (an * an);
        double B = (an - std::sin(an)) / (an * an * an);
        M3 Sk2;
        m3_mul(Sk, Sk, Sk2);
        for (int d = 0; d < 9; ++d) Jl[d] += A * Sk[d] + B * Sk2[d];
      } else {
        for (int d = 0; d < 9; ++d) Jl[d] += 0.5 * Sk[d];
      }
      V3 rho = {xi[0], xi[1], xi[2]}, td;
      m3_apply(Jl, rho, td);
      // compose
      M3 Rn;
      m3_mul(Rd, R_tot, Rn);
      V3 tn;
      m3_apply(Rd, t_tot, tn);
      for (int d = 0; d < 3; ++d) tn[d] += td[d];
      std::memcpy(R_tot, Rn, sizeof(Rn));
      std::memcpy(t_tot, tn, sizeof(tn));
      // convergence (Registration.cpp:37-50)
      double cosang = 0.5 * (Rd[0] + Rd[4] + Rd[8] - 1.0);
      double tsq = td[0] * td[0] + td[1] * td[1] + td[2] * td[2];
      if (cosang >= COS_THR && tsq <= TSQ_THR) { ++iters; break; }
    }
    gn_iters_total += iters;
    t_gn += now_s() - t0;

    // ---- 6. ESKF 6-DoF update -------------------------------------------
    t0 = now_s();
    eskf_update(st, R_tot, t_tot, v_diag);
    t_upd += now_s() - t0;

    // ---- 7. map update (motion gate + insert + periodic eviction) -------
    t0 = now_s();
    M3 R_cur;
    quat_to_mat(st.q, R_cur);
    M3 dRm;
    m3_tmul(last_R, R_cur, dRm);
    double cosang = 0.5 * (dRm[0] + dRm[4] + dRm[8] - 1.0);
    V3 dtm = {st.p[0] - last_t[0], st.p[1] - last_t[1], st.p[2] - last_t[2]};
    V3 dtl;
    m3_tapply(last_R, dtm, dtl);
    double move_sq = dtl[0] * dtl[0] + dtl[1] * dtl[1] + dtl[2] * dtl[2];
    if (cosang < GATE_COS || move_sq > GATE_TSQ) {
      std::memcpy(last_R, R_cur, sizeof(R_cur));
      std::memcpy(last_t, st.p, sizeof(last_t));
      for (int i = 0; i < nk; ++i) {
        const double* bp = &body[3 * kept[i]];
        V3 pw;
        m3_apply(R_cur, bp, pw);
        for (int d = 0; d < 3; ++d) pw[d] += st.p[d];
        Voxel& v = map[key_of(pw, INV_VS)];
        if (v.n < MAX_PPV) {
          // world-rotated source covariance joins the voxel's running
          // mean-of-covariances (LocalMap.hpp:79-87)
          const double* cs = &covs[6 * i];
          M3 Cs = {cs[0], cs[1], cs[2], cs[1], cs[3], cs[4],
                   cs[2], cs[4], cs[5]};
          M3 T1, Cw;
          m3_mul(R_cur, Cs, T1);
          for (int r = 0; r < 3; ++r)
            for (int cdx = 0; cdx < 3; ++cdx) {
              double acc = 0;
              for (int kk = 0; kk < 3; ++kk)
                acc += T1[3 * r + kk] * R_cur[3 * cdx + kk];
              Cw[3 * r + cdx] = acc;
            }
          double cw6[6] = {Cw[0], Cw[1], Cw[2], Cw[4], Cw[5], Cw[8]};
          double n1 = v.n + 1;
          for (int d = 0; d < 3; ++d) v.mean[d] += (pw[d] - v.mean[d]) / n1;
          for (int d = 0; d < 6; ++d) v.cov[d] += (cw6[d] - v.cov[d]) / n1;
          v.n = (int)n1;
        }
      }
    }
    if (t_end - t_last_evict >= EVICT_PERIOD) {
      t_last_evict = t_end;
      for (auto it = map.begin(); it != map.end();) {
        V3 d = {it->second.mean[0] - st.p[0], it->second.mean[1] - st.p[1],
                it->second.mean[2] - st.p[2]};
        double dist = std::sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2]);
        if (dist > EVICT_DIST) it = map.erase(it);
        else ++it;
      }
    }
    t_ins += now_s() - t0;

    traj_t.push_back(t_end);
    traj_xyz.insert(traj_xyz.end(), {st.p[0], st.p[1], st.p[2]});
  }

  double total = now_s() - t_total0;
  const int64_t n_upd = seq.n_scans - 1;

  // trajectory out
  FILE* tf = std::fopen(argv[2], "wb");
  if (tf) {
    int64_t n = (int64_t)traj_t.size();
    std::fwrite(&n, 8, 1, tf);
    std::fwrite(traj_t.data(), 8, n, tf);
    std::fwrite(traj_xyz.data(), 8, 3 * n, tf);
    std::fclose(tf);
  }

  std::printf(
      "{\"ref_scans_per_sec\": %.2f, \"scans\": %lld, \"threads\": %d, "
      "\"map_voxels\": %zu, \"gn_iters_avg\": %.2f, "
      "\"stages_ms\": {\"propagate\": %.2f, \"deskew\": %.2f, "
      "\"downsample\": %.2f, \"cov\": %.2f, \"gn\": %.2f, \"update\": %.2f, "
      "\"insert\": %.2f}}\n",
      n_upd / total, (long long)seq.n_scans,
#ifdef _OPENMP
      omp_get_max_threads(),
#else
      1,
#endif
      map.size(), (double)gn_iters_total / n_upd, 1e3 * t_prop / n_upd,
      1e3 * t_desk / n_upd, 1e3 * t_down / n_upd, 1e3 * t_cov / n_upd,
      1e3 * t_gn / n_upd, 1e3 * t_upd / n_upd, 1e3 * t_ins / n_upd);
  return 0;
}
