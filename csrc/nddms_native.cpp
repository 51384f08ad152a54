// Native host-side runtime for bayesflow_nddms_tpu.
//
// The reference leans on external native code for its hot host paths:
// numba-JIT'd trial loops (basic_ddm_dc.py:85-125), the JAGS/Stan C++
// samplers, and pandas CSV ingest (fitting_stahl_data.py:67). The TPU
// rebuild keeps the compute path on-chip (Pallas/XLA), and this library
// provides the native HOST runtime around it:
//
//   * nddms_exact_sampler: rejection-free-ish exact DDM first-passage
//     sampler (Tuerlinckx et al. 2001 series method) with trial
//     variability (Eta, rangeTau, rangeBeta) and free diffusion
//     coefficient — the CPU oracle twin of ops/exact_sampler.py
//     (reference: pyhddmjagsutils.py:47-176).
//   * nddms_parse_stahl_csv: columnar CSV reader for the Stahl data
//     layout (subj_idx, rt, response, type, pre_Ne, pre_Pe) — the fast
//     ingest path behind data/stahl.py.
//
// Exposed with a plain C ABI for ctypes. OpenMP-free; threading is the
// caller's business (Python side uses one call per worker).
//
// Build: make -C csrc   (produces libnddms_native.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>

namespace {

constexpr double kPi = 3.14159265358979323846;

// First-passage of a zero-start symmetric interval [-r, +r] for drift mu,
// diffusion D = sigma^2/2: series inversion of the exit-time CDF
// (Tuerlinckx et al. 2001, eqs. 13-16). Returns (exit_time, exit_sign).
struct Exit {
  double t;
  int sign;
};

template <typename Rng>
Exit interval_exit(double mu, double D, double radius, Rng &rng,
                   std::uniform_real_distribution<double> &unif) {
  const double lambda =
      0.25 * mu * mu / D + 0.25 * D * kPi * kPi / (radius * radius);
  // F in (0,1): relative contribution of the drift vs diffusion term
  double F = D * kPi / (radius * mu);
  F = F * F / (1.0 + F * F);
  if (!(std::isfinite(F)) || mu == 0.0) F = 1.0;  // mu -> 0 limit
  // exit side: P(+) = logistic(radius * mu / D)
  const double ex = std::exp(radius * mu / D);
  const double prob = ex / (1.0 + ex);
  const int sign = (unif(rng) < prob) ? 1 : -1;

  // sample the exit time by rejection on the alternating series
  // (formula 16): accept s1 when 1 + s1^{-F} * sum_k ... >= s2-ish.
  const double eps = 2.220446049250313e-16;
  for (;;) {
    double s2 = unif(rng);
    double s1 = unif(rng);
    double t_new = 0.0, t_old = 0.0;
    int uu = 0;
    do {
      t_old = t_new;
      ++uu;
      const double sgn = (uu % 2 == 0) ? 1.0 : -1.0;
      t_new = t_old + (2.0 * uu + 1.0) * sgn *
                          std::pow(s1, F * (2.0 * uu + 1.0) * (2.0 * uu + 1.0));
    } while (std::fabs(t_new - t_old) > eps || uu == 0);
    const double l = 1.0 + std::pow(s1, -F) * t_new;
    if (s2 <= l) {
      return Exit{std::fabs(std::log(s1)) / lambda, sign};
    }
  }
}

}  // namespace

extern "C" {

// Exact sampler; writes n signed RTs (+upper/-lower) into out[n].
// Semantics mirror pyhddmjagsutils.simulratcliff(:47-176) including the
// clamps |Nu|<=5, Eta<=3 and the Eta==0 epsilon.
void nddms_exact_sampler(int64_t n, double alpha, double tau, double nu,
                         double beta, double range_tau, double range_beta,
                         double eta, double varsigma, uint64_t seed,
                         double *out) {
  std::mt19937_64 rng(seed);
  std::normal_distribution<double> normal(0.0, 1.0);
  std::uniform_real_distribution<double> unif(0.0, 1.0);

  if (nu < -5.0) nu = -5.0;
  if (nu > 5.0) nu = 5.0;
  if (eta > 3.0) eta = 3.0;
  if (eta == 0.0) eta = 1e-16;

  const double D = 0.5 * varsigma * varsigma;

  for (int64_t i = 0; i < n; ++i) {
    const double mu = nu + normal(rng) * eta;
    const double bb = beta - 0.5 * range_beta + range_beta * unif(rng);
    const double zz = bb * alpha;
    double upper = alpha - zz;  // distance to upper bound
    double lower = -zz;         // distance to lower bound (negative)
    double pos = 0.0;
    double total = 0.0;
    int done = 0;
    double delta = 2.220446049250313e-16;
    while (!done) {
      const double radius = std::min(std::fabs(upper - pos),
                                     std::fabs(pos - lower));
      Exit e = interval_exit(mu, D, radius, rng, unif);
      total += e.t;
      pos += e.sign * radius;
      if (pos + delta >= upper) {
        const double ndt = tau - 0.5 * range_tau + range_tau * unif(rng);
        out[i] = ndt + total;
        done = 1;
      } else if (pos - delta <= lower) {
        const double ndt = tau - 0.5 * range_tau + range_tau * unif(rng);
        out[i] = -(ndt + total);
        done = 1;
      }
    }
  }
}

// Columnar CSV reader for the Stahl layout. Returns the number of data
// rows parsed, or -1 on error. Caller provides capacity-sized buffers.
// Columns: subj_idx, rt, response, type, pre_Ne, pre_Pe (header skipped).
int64_t nddms_parse_stahl_csv(const char *path, int64_t capacity,
                              int32_t *subj, double *rt, int32_t *response,
                              double *pre_ne, double *pre_pe) {
  FILE *f = std::fopen(path, "r");
  if (!f) return -1;
  char line[4096];
  if (!std::fgets(line, sizeof line, f)) {  // header
    std::fclose(f);
    return -1;
  }
  // locate column indices from the header
  int col_subj = -1, col_rt = -1, col_resp = -1, col_ne = -1, col_pe = -1;
  {
    int idx = 0;
    char *save = nullptr;
    // strip newline
    line[std::strcspn(line, "\r\n")] = 0;
    for (char *tok = strtok_r(line, ",", &save); tok;
         tok = strtok_r(nullptr, ",", &save), ++idx) {
      if (!std::strcmp(tok, "subj_idx")) col_subj = idx;
      else if (!std::strcmp(tok, "rt")) col_rt = idx;
      else if (!std::strcmp(tok, "response")) col_resp = idx;
      else if (!std::strcmp(tok, "pre_Ne")) col_ne = idx;
      else if (!std::strcmp(tok, "pre_Pe")) col_pe = idx;
    }
    if (col_subj < 0 || col_rt < 0 || col_resp < 0 || col_ne < 0 ||
        col_pe < 0) {
      std::fclose(f);
      return -1;
    }
  }
  int64_t row = 0;
  while (row < capacity && std::fgets(line, sizeof line, f)) {
    line[std::strcspn(line, "\r\n")] = 0;
    if (!line[0]) continue;
    int idx = 0;
    char *save = nullptr;
    for (char *tok = strtok_r(line, ",", &save); tok;
         tok = strtok_r(nullptr, ",", &save), ++idx) {
      if (idx == col_subj) subj[row] = (int32_t)std::strtol(tok, nullptr, 10);
      else if (idx == col_rt) rt[row] = std::strtod(tok, nullptr);
      else if (idx == col_resp)
        response[row] = (int32_t)std::strtol(tok, nullptr, 10);
      else if (idx == col_ne) pre_ne[row] = std::strtod(tok, nullptr);
      else if (idx == col_pe) pre_pe[row] = std::strtod(tok, nullptr);
    }
    ++row;
  }
  std::fclose(f);
  return row;
}

}  // extern "C"
