// Minimal dense linear algebra for the native MPC stack.
//
// The stage matrices are tiny (11x11 states, 2 controls, ~10 constraint
// rows), so a dependency-free row-major Mat with Cholesky solves is all the
// solver needs — the native analogue of the role BLASFEO/Eigen play in the
// reference's C++ MPCC (Matlab-tests/MPCC-master/C++), sized for this
// problem instead of generic BLAS.
#pragma once

#include <cassert>
#include <cmath>
#include <cstring>
#include <vector>

namespace cmpc {

struct Mat {
  int r = 0, c = 0;
  std::vector<double> d;

  Mat() = default;
  Mat(int r_, int c_) : r(r_), c(c_), d(static_cast<size_t>(r_) * c_, 0.0) {}

  double& operator()(int i, int j) { return d[static_cast<size_t>(i) * c + j]; }
  double operator()(int i, int j) const {
    return d[static_cast<size_t>(i) * c + j];
  }

  static Mat eye(int n) {
    Mat m(n, n);
    for (int i = 0; i < n; ++i) m(i, i) = 1.0;
    return m;
  }
};

using Vec = std::vector<double>;

inline Mat matmul(const Mat& a, const Mat& b) {
  assert(a.c == b.r);
  Mat out(a.r, b.c);
  for (int i = 0; i < a.r; ++i)
    for (int k = 0; k < a.c; ++k) {
      const double aik = a(i, k);
      if (aik == 0.0) continue;
      for (int j = 0; j < b.c; ++j) out(i, j) += aik * b(k, j);
    }
  return out;
}

inline Mat transpose(const Mat& a) {
  Mat out(a.c, a.r);
  for (int i = 0; i < a.r; ++i)
    for (int j = 0; j < a.c; ++j) out(j, i) = a(i, j);
  return out;
}

inline Vec matvec(const Mat& a, const Vec& x) {
  assert(static_cast<int>(x.size()) == a.c);
  Vec out(a.r, 0.0);
  for (int i = 0; i < a.r; ++i) {
    double s = 0.0;
    for (int j = 0; j < a.c; ++j) s += a(i, j) * x[j];
    out[i] = s;
  }
  return out;
}

inline Vec matvecT(const Mat& a, const Vec& x) {  // a^T x
  assert(static_cast<int>(x.size()) == a.r);
  Vec out(a.c, 0.0);
  for (int i = 0; i < a.r; ++i) {
    const double xi = x[i];
    for (int j = 0; j < a.c; ++j) out[j] += a(i, j) * xi;
  }
  return out;
}

inline Mat add(const Mat& a, const Mat& b) {
  Mat out = a;
  for (size_t i = 0; i < out.d.size(); ++i) out.d[i] += b.d[i];
  return out;
}

inline void axpy(double alpha, const Vec& x, Vec& y) {
  for (size_t i = 0; i < y.size(); ++i) y[i] += alpha * x[i];
}

// In-place lower Cholesky of an SPD matrix.
inline bool cholesky(Mat& a) {
  assert(a.r == a.c);
  const int n = a.r;
  for (int j = 0; j < n; ++j) {
    double diag = a(j, j);
    for (int k = 0; k < j; ++k) diag -= a(j, k) * a(j, k);
    if (diag <= 0.0) return false;
    const double ljj = std::sqrt(diag);
    a(j, j) = ljj;
    for (int i = j + 1; i < n; ++i) {
      double s = a(i, j);
      for (int k = 0; k < j; ++k) s -= a(i, k) * a(j, k);
      a(i, j) = s / ljj;
    }
    for (int i = 0; i < j; ++i) a(i, j) = 0.0;
  }
  return true;
}

// Solve L L^T x = b with L lower-triangular (from cholesky()).
inline Vec cho_solve(const Mat& L, Vec b) {
  const int n = L.r;
  for (int i = 0; i < n; ++i) {  // forward
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L(i, k) * b[k];
    b[i] = s / L(i, i);
  }
  for (int i = n - 1; i >= 0; --i) {  // backward
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= L(k, i) * b[k];
    b[i] = s / L(i, i);
  }
  return b;
}

// Solve L L^T X = B columnwise.
inline Mat cho_solve_mat(const Mat& L, const Mat& B) {
  Mat out(B.r, B.c);
  Vec col(B.r);
  for (int j = 0; j < B.c; ++j) {
    for (int i = 0; i < B.r; ++i) col[i] = B(i, j);
    Vec x = cho_solve(L, col);
    for (int i = 0; i < B.r; ++i) out(i, j) = x[i];
  }
  return out;
}

}  // namespace cmpc
