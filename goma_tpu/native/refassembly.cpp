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

// Generic multi-field variant: the per-config baseline denominator.
//
// The reference hand-assembles EVERY active equation's residual and its
// analytic Jacobian w.r.t. every active variable in one scalar quadrature
// loop (src/mm_fill.c:1144-1700 dispatch, per-entry writes into lec->J);
// the per-element cost therefore scales ~ nq * n_ldof^2 with a per-entry
// body of a few fused multiply-adds. This kernel reproduces that cost
// shape for nv2 Q2-interpolated scalar fields + nv1 Q1 fields on a 2D
// 9-node quad: coupled advection-diffusion residuals with hand-coded
// Jacobian entries, compiled -O3, one core. n_ldof = 9*nv2 + 4*nv1.
static void one_elem_generic(int nq, int nv2, int nv1, const double* N2,
                             const double* dN2, const double* N1,
                             const double* qwts, const double* X,
                             const double* q, double* r, double* J) {
  const int nl = 9 * nv2 + 4 * nv1;
  std::memset(r, 0, nl * sizeof(double));
  std::memset(J, 0, (size_t)nl * nl * sizeof(double));
  double val[32], grad[32][2];  // nv2 + nv1 <= 32 fields
  for (int iq = 0; iq < nq; ++iq) {
    const double* n2 = N2 + iq * 9;
    const double* d2 = dN2 + iq * 18;
    const double* n1 = N1 + iq * 4;
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
    double g2[9][2], g1[4][2];
    for (int n = 0; n < 9; ++n) {
      g2[n][0] = d2[2 * n] * inv[0][0] + d2[2 * n + 1] * inv[1][0];
      g2[n][1] = d2[2 * n] * inv[0][1] + d2[2 * n + 1] * inv[1][1];
    }
    // Q1 gradients from the corner subset of the Q2 geometry map
    for (int n = 0; n < 4; ++n) {
      g1[n][0] = g2[n][0];
      g1[n][1] = g2[n][1];
    }
    for (int f = 0; f < nv2; ++f) {
      val[f] = 0.0;
      grad[f][0] = grad[f][1] = 0.0;
      const double* qf = q + 9 * f;
      for (int n = 0; n < 9; ++n) {
        val[f] += qf[n] * n2[n];
        grad[f][0] += qf[n] * g2[n][0];
        grad[f][1] += qf[n] * g2[n][1];
      }
    }
    for (int f = 0; f < nv1; ++f) {
      int fi = nv2 + f;
      val[fi] = 0.0;
      grad[fi][0] = grad[fi][1] = 0.0;
      const double* qf = q + 9 * nv2 + 4 * f;
      for (int n = 0; n < 4; ++n) {
        val[fi] += qf[n] * n1[n];
        grad[fi][0] += qf[n] * g1[n][0];
        grad[fi][1] += qf[n] * g1[n][1];
      }
    }
    double w = qwts[iq] * det;
    // advecting velocity = fields 0,1 (or zero when absent)
    double u0 = nv2 > 0 ? val[0] : 0.0;
    double u1 = nv2 > 1 ? val[1] : 0.0;
    const int nf = nv2 + nv1;
    // residuals: advection + diffusion + all-pairs coupling source
    for (int fe = 0; fe < nf; ++fe) {
      double adv = u0 * grad[fe][0] + u1 * grad[fe][1];
      double cpl = 0.0;
      for (int fv = 0; fv < nf; ++fv) cpl += 0.01 * val[fv] * val[fe];
      int nb = fe < nv2 ? 9 : 4;
      int off = fe < nv2 ? 9 * fe : 9 * nv2 + 4 * (fe - nv2);
      for (int i = 0; i < nb; ++i) {
        const double* gi = fe < nv2 ? g2[i] : g1[i];
        double phi = fe < nv2 ? n2[i] : n1[i];
        r[off + i] += w * (phi * (adv + cpl) +
                           0.1 * (gi[0] * grad[fe][0] + gi[1] * grad[fe][1]));
      }
    }
    // hand-coded Jacobian: every (row eq, col var) pair gets its analytic
    // sensitivity written per entry, like lec->J
    for (int fe = 0; fe < nf; ++fe) {
      int nbi = fe < nv2 ? 9 : 4;
      int offi = fe < nv2 ? 9 * fe : 9 * nv2 + 4 * (fe - nv2);
      double adv = u0 * grad[fe][0] + u1 * grad[fe][1];
      (void)adv;
      for (int i = 0; i < nbi; ++i) {
        const double* gi = fe < nv2 ? g2[i] : g1[i];
        double phi = fe < nv2 ? n2[i] : n1[i];
        int row = offi + i;
        for (int fb = 0; fb < nf; ++fb) {
          int nbj = fb < nv2 ? 9 : 4;
          int offj = fb < nv2 ? 9 * fb : 9 * nv2 + 4 * (fb - nv2);
          for (int jn = 0; jn < nbj; ++jn) {
            const double* gj = fb < nv2 ? g2[jn] : g1[jn];
            double psi = fb < nv2 ? n2[jn] : n1[jn];
            double v = 0.01 * phi * psi * (val[fe] + val[fb]);  // coupling
            if (fb == fe) {
              v += phi * (u0 * gj[0] + u1 * gj[1]) +
                   0.1 * (gi[0] * gj[0] + gi[1] * gj[1]);
            }
            if (fb < 2 && nv2 > 1)  // advecting-velocity sensitivity
              v += phi * psi * grad[fe][fb];
            J[(size_t)row * nl + offj + jn] += w * v;
          }
        }
      }
    }
  }
}

double ref_assembly_generic_seconds_per_element(
    int nq, int nv2, int nv1, const double* N2, const double* dN2,
    const double* N1, const double* qwts, const double* X, const double* q,
    int n_rep) {
  const int nl = 9 * nv2 + 4 * nv1;
  double* r = new double[nl];
  double* J = new double[(size_t)nl * nl];
  one_elem_generic(nq, nv2, nv1, N2, dN2, N1, qwts, X, q, r, J);
  auto t0 = std::chrono::steady_clock::now();
  volatile double sink = 0.0;
  for (int it = 0; it < n_rep; ++it) {
    one_elem_generic(nq, nv2, nv1, N2, dN2, N1, qwts, X, q, r, J);
    sink += r[0] + J[5];
  }
  auto t1 = std::chrono::steady_clock::now();
  (void)sink;
  double dt = std::chrono::duration<double>(t1 - t0).count() / n_rep;
  delete[] r;
  delete[] J;
  return dt;
}

}  // extern "C"
