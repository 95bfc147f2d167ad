// Reference-architecture cost probe: a fresh C++17/OpenMP implementation of
// the SAME ALGORITHM the reference runs per scan (not a copy of its code),
// timed on this host CPU to replace the "assume the reference runs at the
// 10 Hz sensor rate" denominator in bench.py with a measured scans/s.
//
// Pipeline modelled (algorithmic parity, reference file:line for each):
//   1. ESKF IMU propagation: nominal + 18x18 covariance per sample
//      (ErrorStateKF.cpp:76-113) — dense F P F^T + Q.
//   2. Voxel downsample: first-point-per-voxel through a hash map
//      (CloudPreprocessor.cpp:85-99).
//   3. Per-point covariance from the surrounding grid neighbourhood
//      (stand-in for the KD-tree KNN(30)+SVD of
//      CloudPreprocessor.cpp:103-124; the grid pass is CHEAPER than a
//      KD-tree build + 30-NN queries, so the resulting scans/s
//      over-estimates the reference — a conservative denominator).
//   4. VGICP Gauss-Newton: per-point single-voxel hash lookup
//      (LocalMap.cpp:78-109) + J^T Σ^-1 J / J^T Σ^-1 r accumulation and a
//      6x6 solve per iteration (Registration.cpp:52-102), OpenMP-reduced,
//      ITERS iterations per scan.
//   5. Map insert: per-point hash emplace + running mean/cov update capped
//      at 1000 (LocalMap.cpp:47-58, LocalMap.hpp:79-87).
//
// Build & run:  make -C native ref_baseline && native/ref_baseline
// Prints one JSON line: {"ref_scans_per_sec": ..., "stages_ms": {...}}

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <ctime>
#include <random>
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

struct V3 { double x, y, z; };

struct Voxel {
  int n = 0;
  double mean[3] = {0, 0, 0};
  double cov[6] = {0, 0, 0, 0, 0, 0};
};

struct KeyHash {
  size_t operator()(const int64_t& k) const {
    return std::hash<int64_t>()(k * 0x9E3779B97F4A7C15ull);
  }
};

using VoxMap = std::unordered_map<int64_t, Voxel, KeyHash>;

static inline int64_t key_of(double x, double y, double z, double inv_vs) {
  int64_t ix = (int64_t)std::floor(x * inv_vs) + (1 << 20);
  int64_t iy = (int64_t)std::floor(y * inv_vs) + (1 << 20);
  int64_t iz = (int64_t)std::floor(z * inv_vs) + (1 << 20);
  return (ix << 42) | (iy << 21) | iz;
}

// ---- stage 1: ESKF propagation ------------------------------------------
static void eskf_propagate(int samples, double P[18][18]) {
  double F[18][18];
  for (int s = 0; s < samples; ++s) {
    // build F (identity + off-diagonal blocks, as ErrorStateKF.cpp:98-105)
    for (int i = 0; i < 18; ++i)
      for (int j = 0; j < 18; ++j) F[i][j] = (i == j) ? 1.0 : 0.0;
    double dt = 0.0025;
    for (int i = 0; i < 3; ++i) {
      F[i][3 + i] = dt;
      F[3 + i][6 + i] = -dt * 0.4;
      F[3 + i][9 + i] = -dt;
      F[6 + i][12 + i] = -dt;
      F[3 + i][15 + i] = dt;
    }
    // P <- F P F^T + Q
    double T[18][18];
    for (int i = 0; i < 18; ++i)
      for (int j = 0; j < 18; ++j) {
        double acc = 0;
        for (int k = 0; k < 18; ++k) acc += F[i][k] * P[k][j];
        T[i][j] = acc;
      }
    for (int i = 0; i < 18; ++i)
      for (int j = 0; j < 18; ++j) {
        double acc = 0;
        for (int k = 0; k < 18; ++k) acc += T[i][k] * F[j][k];
        P[i][j] = acc + (i == j ? 1e-8 : 0.0);
      }
  }
}

// ---- 6x6 LDLT solve ------------------------------------------------------
static void solve6(const double A[6][6], const double b[6], double x[6]) {
  double L[6][6] = {{0}}, D[6] = {0};
  for (int j = 0; j < 6; ++j) {
    double d = A[j][j];
    for (int k = 0; k < j; ++k) d -= L[j][k] * L[j][k] * D[k];
    D[j] = d;
    L[j][j] = 1.0;
    for (int i = j + 1; i < 6; ++i) {
      double v = A[i][j];
      for (int k = 0; k < j; ++k) v -= L[i][k] * L[j][k] * D[k];
      L[i][j] = v / (d != 0 ? d : 1e-12);
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    y[i] = b[i];
    for (int k = 0; k < i; ++k) y[i] -= L[i][k] * y[k];
  }
  for (int i = 0; i < 6; ++i) y[i] /= (D[i] != 0 ? D[i] : 1e-12);
  for (int i = 5; i >= 0; --i) {
    x[i] = y[i];
    for (int k = i + 1; k < 6; ++k) x[i] -= L[k][i] * x[k];
  }
}

int main(int argc, char** argv) {
  const int RAW = argc > 1 ? atoi(argv[1]) : 120000;  // pts per sweep
  const int SCANS = argc > 2 ? atoi(argv[2]) : 50;
  const int IMU_PER_SCAN = 40;  // 400 Hz / 10 Hz
  const int ITERS = 3;          // measured GN iterations/scan (bench diag)
  const double VS = 0.3, INV_VS = 1.0 / VS;

  std::mt19937 rng(7);
  std::uniform_real_distribution<double> uni(-40.0, 40.0);

  VoxMap map;
  map.reserve(1 << 20);
  double P[18][18] = {{0}};
  for (int i = 0; i < 18; ++i) P[i][i] = 1e-3;

  double t_eskf = 0, t_down = 0, t_cov = 0, t_gn = 0, t_ins = 0;
  double checksum = 0;

  for (int s = 0; s < SCANS; ++s) {
    // synthetic sweep: points on a rough shell (world-scale spread like the
    // bench's synthetic world)
    std::vector<V3> pts(RAW);
    for (auto& p : pts) { p = {uni(rng), uni(rng), 0.2 * uni(rng)}; }

    double t0 = now_s();
    eskf_propagate(IMU_PER_SCAN, P);
    t_eskf += now_s() - t0;

    // 2. downsample: first point per voxel (sequential hash, as ref)
    t0 = now_s();
    VoxMap first;
    first.reserve(RAW);
    std::vector<V3> kept;
    kept.reserve(RAW / 3);
    for (const auto& p : pts) {
      int64_t k = key_of(p.x, p.y, p.z, INV_VS);
      if (first.emplace(k, Voxel{}).second) kept.push_back(p);
    }
    t_down += now_s() - t0;

    // 3. neighbourhood covariance per kept point (grid stand-in for KNN)
    t0 = now_s();
    // bin all raw points
    std::unordered_map<int64_t, std::vector<int>, KeyHash> bins;
    bins.reserve(kept.size() * 2);
    for (int i = 0; i < (int)pts.size(); ++i)
      bins[key_of(pts[i].x, pts[i].y, pts[i].z, INV_VS)].push_back(i);
    std::vector<std::array<double, 6>> covs(kept.size());
#pragma omp parallel for schedule(static)
    for (int i = 0; i < (int)kept.size(); ++i) {
      double m[3] = {0, 0, 0}, c2[6] = {0, 0, 0, 0, 0, 0};
      int n = 0;
      for (int dx = -1; dx <= 1; ++dx)
        for (int dy = -1; dy <= 1; ++dy)
          for (int dz = -1; dz <= 1; ++dz) {
            auto it = bins.find(key_of(kept[i].x + dx * VS, kept[i].y + dy * VS,
                                       kept[i].z + dz * VS, INV_VS));
            if (it == bins.end()) continue;
            for (int j : it->second) {
              const auto& q = pts[j];
              m[0] += q.x; m[1] += q.y; m[2] += q.z;
              c2[0] += q.x * q.x; c2[1] += q.x * q.y; c2[2] += q.x * q.z;
              c2[3] += q.y * q.y; c2[4] += q.y * q.z; c2[5] += q.z * q.z;
              ++n;
            }
          }
      double inv = n > 0 ? 1.0 / n : 0.0;
      for (int k = 0; k < 3; ++k) m[k] *= inv;
      covs[i] = {c2[0] * inv - m[0] * m[0], c2[1] * inv - m[0] * m[1],
                 c2[2] * inv - m[0] * m[2], c2[3] * inv - m[1] * m[1],
                 c2[4] * inv - m[1] * m[2], c2[5] * inv - m[2] * m[2]};
    }
    t_cov += now_s() - t0;

    // 4. VGICP GN iterations (lookup + accumulate + solve)
    t0 = now_s();
    double xi[6] = {0, 0, 0, 0, 0, 0};
    for (int it = 0; it < ITERS; ++it) {
      double JTJ[6][6] = {{0}}, JTr[6] = {0};
#pragma omp parallel
      {
        double jtj[6][6] = {{0}}, jtr[6] = {0};
#pragma omp for schedule(static) nowait
        for (int i = 0; i < (int)kept.size(); ++i) {
          auto itv = map.find(
              key_of(kept[i].x + xi[0], kept[i].y + xi[1], kept[i].z + xi[2],
                     INV_VS));
          if (itv == map.end() || itv->second.n < 1) continue;
          const Voxel& v = itv->second;
          double r[3] = {v.mean[0] - kept[i].x, v.mean[1] - kept[i].y,
                         v.mean[2] - kept[i].z};
          // J = [I | -[p]x]; weight by (cov_src + cov_map)^-1 approximated
          // by its diagonal inverse (full 3x3 inverse adds ~20 flops/pt;
          // the lookup and accumulation dominate either way)
          double w[3];
          for (int k = 0; k < 3; ++k) {
            double c = covs[i][k == 0 ? 0 : (k == 1 ? 3 : 5)] +
                       v.cov[k == 0 ? 0 : (k == 1 ? 3 : 5)];
            w[k] = 1.0 / (c + 1e-3);
          }
          double J[3][6];
          for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 6; ++b) J[a][b] = 0;
          J[0][0] = J[1][1] = J[2][2] = 1;
          J[0][4] = kept[i].z; J[0][5] = -kept[i].y;
          J[1][3] = -kept[i].z; J[1][5] = kept[i].x;
          J[2][3] = kept[i].y; J[2][4] = -kept[i].x;
          for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 6; ++b) {
              double jw = J[a][b] * w[a];
              jtr[b] += jw * r[a];
              for (int c = b; c < 6; ++c) jtj[b][c] += jw * J[a][c];
            }
        }
#pragma omp critical
        {
          for (int b = 0; b < 6; ++b) {
            JTr[b] += jtr[b];
            for (int c = b; c < 6; ++c) JTJ[b][c] += jtj[b][c];
          }
        }
      }
      for (int b = 0; b < 6; ++b)
        for (int c = 0; c < b; ++c) JTJ[b][c] = JTJ[c][b];
      double dx[6];
      solve6(JTJ, JTr, dx);
      for (int k = 0; k < 6; ++k) xi[k] += 1e-3 * dx[k];
    }
    checksum += xi[0];
    t_gn += now_s() - t0;

    // 5. map insert with running mean/cov, cap 1000
    t0 = now_s();
    for (int i = 0; i < (int)kept.size(); ++i) {
      Voxel& v = map[key_of(kept[i].x, kept[i].y, kept[i].z, INV_VS)];
      if (v.n < 1000) {
        double n1 = v.n + 1;
        v.mean[0] += (kept[i].x - v.mean[0]) / n1;
        v.mean[1] += (kept[i].y - v.mean[1]) / n1;
        v.mean[2] += (kept[i].z - v.mean[2]) / n1;
        for (int k = 0; k < 6; ++k)
          v.cov[k] += (covs[i][k] - v.cov[k]) / n1;
        v.n = (int)n1;
      }
    }
    t_ins += now_s() - t0;
  }

  double total = t_eskf + t_down + t_cov + t_gn + t_ins;
  printf(
      "{\"ref_scans_per_sec\": %.2f, \"raw_points\": %d, \"scans\": %d, "
      "\"threads\": %d, \"map_voxels\": %zu, \"checksum\": %.3g, "
      "\"stages_ms\": {\"eskf\": %.2f, \"downsample\": %.2f, \"cov\": %.2f, "
      "\"gn_x%d\": %.2f, \"insert\": %.2f}}\n",
      SCANS / total, RAW, SCANS,
#ifdef _OPENMP
      omp_get_max_threads(),
#else
      1,
#endif
      map.size(), checksum, 1e3 * t_eskf / SCANS, 1e3 * t_down / SCANS,
      1e3 * t_cov / SCANS, ITERS, 1e3 * t_gn / SCANS, 1e3 * t_ins / SCANS);
  return 0;
}
