// Reference-style scalar element assembly baseline (benchmark only).
//
// Mirrors the *structure* of the reference's per-element fill (quadrature
// loop, per-entry residual and hand-coded Jacobian writes into a local
// lec->J block, cf. src/mm_fill_momentum.c / src/mm_fill.c) for a 2D Q2/Q1
// Navier-Stokes element, compiled -O3 on one x86 core. This is the honest
// denominator for the bench's "assembly speedup vs 1 core" number — a
// compiled scalar loop, not interpreted python.

#include <cstdint>
#include <cstring>
#include <chrono>

extern "C" {

// tables: N2 (nq x 9), dN2 (nq x 9 x 2), N1 (nq x 4), qwts (nq), X (9 x 2)
// q: local dof vector (22) = [u (9), v (9), p (4)]
// out r (22), J (22 x 22)
static void one_elem(int nq, const double* N2, const double* dN2,
                     const double* N1, const double* qwts, const double* X,
                     const double* q, double mu, double rho, double* r,
                     double* J) {
  std::memset(r, 0, 22 * sizeof(double));
  std::memset(J, 0, 22 * 22 * sizeof(double));
  for (int iq = 0; iq < nq; ++iq) {
    const double* n2 = N2 + iq * 9;
    const double* d2 = dN2 + iq * 18;
    const double* n1 = N1 + iq * 4;
    // isoparametric map
    double Jm[2][2] = {{0, 0}, {0, 0}};
    for (int n = 0; n < 9; ++n) {
      Jm[0][0] += d2[2 * n + 0] * X[2 * n + 0];
      Jm[0][1] += d2[2 * n + 0] * X[2 * n + 1];
      Jm[1][0] += d2[2 * n + 1] * X[2 * n + 0];
      Jm[1][1] += d2[2 * n + 1] * X[2 * n + 1];
    }
    double det = Jm[0][0] * Jm[1][1] - Jm[0][1] * Jm[1][0];
    double inv[2][2] = {{Jm[1][1] / det, -Jm[0][1] / det},
                        {-Jm[1][0] / det, Jm[0][0] / det}};
    double g2[9][2];
    for (int n = 0; n < 9; ++n) {
      g2[n][0] = d2[2 * n] * inv[0][0] + d2[2 * n + 1] * inv[1][0];
      g2[n][1] = d2[2 * n] * inv[0][1] + d2[2 * n + 1] * inv[1][1];
    }
    double w = qwts[iq] * det;
    // field values
    double u[2] = {0, 0}, gu[2][2] = {{0, 0}, {0, 0}}, p = 0;
    for (int n = 0; n < 9; ++n) {
      u[0] += q[n] * n2[n];
      u[1] += q[9 + n] * n2[n];
      for (int k = 0; k < 2; ++k) {
        gu[0][k] += q[n] * g2[n][k];
        gu[1][k] += q[9 + n] * g2[n][k];
      }
    }
    for (int n = 0; n < 4; ++n) p += q[18 + n] * n1[n];

    double conv[2] = {gu[0][0] * u[0] + gu[0][1] * u[1],
                      gu[1][0] * u[0] + gu[1][1] * u[1]};
    double sig[2][2];
    for (int a = 0; a < 2; ++a)
      for (int k = 0; k < 2; ++k)
        sig[a][k] = mu * (gu[a][k] + gu[k][a]) - (a == k ? p : 0.0);

    for (int a = 0; a < 2; ++a)
      for (int i = 0; i < 9; ++i)
        r[a * 9 + i] += w * (rho * conv[a] * n2[i] +
                             g2[i][0] * sig[a][0] + g2[i][1] * sig[a][1]);
    for (int i = 0; i < 4; ++i)
      r[18 + i] += w * (gu[0][0] + gu[1][1]) * n1[i];

    // hand-coded Jacobian writes (per-entry, like lec->J)
    for (int a = 0; a < 2; ++a) {
      for (int i = 0; i < 9; ++i) {
        int row = a * 9 + i;
        for (int b = 0; b < 2; ++b) {
          for (int jn = 0; jn < 9; ++jn) {
            int col = b * 9 + jn;
            double val =
                rho * n2[i] * ((a == b ? (g2[jn][0] * u[0] + g2[jn][1] * u[1]) : 0.0) +
                               gu[a][b] * n2[jn]);
            val += mu * ((a == b ? (g2[i][0] * g2[jn][0] + g2[i][1] * g2[jn][1]) : 0.0) +
                         g2[i][b] * g2[jn][a]);
            J[row * 22 + col] += w * val;
          }
        }
        for (int jn = 0; jn < 4; ++jn) {
          J[row * 22 + 18 + jn] += -w * g2[i][a] * n1[jn];
          J[(18 + jn) * 22 + row] += w * n1[jn] * g2[i][a];
        }
      }
    }
  }
}

double ref_assembly_seconds_per_element(int nq, const double* N2,
                                        const double* dN2, const double* N1,
                                        const double* qwts, const double* X,
                                        const double* q, int n_rep) {
  double r[22];
  double J[22 * 22];
  // warm up
  one_elem(nq, N2, dN2, N1, qwts, X, q, 0.01, 1.0, r, J);
  auto t0 = std::chrono::steady_clock::now();
  volatile double sink = 0.0;
  for (int it = 0; it < n_rep; ++it) {
    one_elem(nq, N2, dN2, N1, qwts, X, q, 0.01, 1.0, r, J);
    sink += r[0] + J[5];
  }
  auto t1 = std::chrono::steady_clock::now();
  (void)sink;
  return std::chrono::duration<double>(t1 - t0).count() / n_rep;
}

}  // extern "C"
