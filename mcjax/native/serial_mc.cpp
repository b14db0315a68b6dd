// Serial Metropolis Monte Carlo — native C++ golden implementation.
//
// Role in mcjax: an independent-language physics oracle and CPU baseline,
// mirroring how the reference validated its GPU kernels against a serial CPU
// implementation (host calc_energy, kernel.cu:452-470, and the pptx slide-14
// "serial CPU" comparison). Built with g++ into a small shared library and
// driven through ctypes (mcjax.native). No CUDA/torch anywhere: the TPU
// compute path is JAX/XLA/Pallas; this is host-side test/benchmark tooling.
//
// Models: 0 = truncated Lennard-Jones (eps=sig=1, rc param), 1 = hard
// disks/spheres (diameter param). Exact Metropolis accept; full O(N) energy
// per trial move; minimum-image PBC with the proper L/2 convention
// (SURVEY.md Q8).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// xoshiro256++ (public-domain construction) — fast, reproducible streams.
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 initialization
    uint64_t z = seed;
    for (int i = 0; i < 4; i++) {
      z += 0x9e3779b97f4a7c15ull;
      uint64_t x = z;
      x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
      x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
      s[i] = x ^ (x >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[0] + s[3], 23) + s[0];
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * 0x1.0p-53;
  }
  double normal() {  // Box-Muller
    double u1 = uniform(), u2 = uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return std::sqrt(-2.0 * std::log(u1)) * std::cos(6.283185307179586 * u2);
  }
};

inline double min_image(double d, double box) {
  return d - box * std::nearbyint(d / box);
}

inline double wrap(double x, double box) {
  double half = box / 2.0;
  x = std::fmod(x + half, box);
  if (x < 0) x += box;
  return x - half;
}

struct Model {
  int kind;       // 0 = LJ, 1 = hard
  double param;   // rc (LJ) or diameter (hard)
  // energy of pair at squared distance r2; sets *overlap for hard cores
  double pair(double r2, bool* overlap) const {
    if (kind == 1) {
      if (r2 < param * param) *overlap = true;
      return 0.0;
    }
    if (r2 > param * param || r2 <= 0.0) return 0.0;
    double inv2 = 1.0 / r2;
    double inv6 = inv2 * inv2 * inv2;
    return 4.0 * (inv6 * inv6 - inv6);
  }
};

double particle_energy(const double* pos, int n, int dim, int i,
                       const double* xi, double box, const Model& m,
                       bool* overlap) {
  double e = 0.0;
  for (int j = 0; j < n; j++) {
    if (j == i) continue;
    double r2 = 0.0;
    for (int d = 0; d < dim; d++) {
      double del = min_image(xi[d] - pos[j * dim + d], box);
      r2 += del * del;
    }
    e += m.pair(r2, overlap);
  }
  return e;
}

}  // namespace

extern "C" {

// Exact O(N^2) total energy; returns energy, sets *any_overlap (0/1).
double mcjax_total_energy(int dim, int n, const double* pos, double box,
                          int model_kind, double model_param,
                          int* any_overlap) {
  Model m{model_kind, model_param};
  bool ov = false;
  double e = 0.0;
  for (int i = 0; i < n; i++)
    for (int j = i + 1; j < n; j++) {
      double r2 = 0.0;
      for (int d = 0; d < dim; d++) {
        double del = min_image(pos[i * dim + d] - pos[j * dim + d], box);
        r2 += del * del;
      }
      e += m.pair(r2, &ov);
    }
  *any_overlap = ov ? 1 : 0;
  return e;
}

// Serial single-particle Metropolis chain; positions updated in place.
// proposal: 0 = gaussian(step), 1 = uniform(-step, step).
// Returns the number of accepted moves.
long long mcjax_serial_run(int dim, int n, double* pos, double box,
                           double beta, double step, long long n_steps,
                           uint64_t seed, int model_kind, double model_param,
                           int proposal) {
  Model m{model_kind, model_param};
  Rng rng(seed);
  long long accepted = 0;
  double xi[3], xn[3];
  for (long long t = 0; t < n_steps; t++) {
    int i = (int)(rng.uniform() * n);
    if (i >= n) i = n - 1;
    for (int d = 0; d < dim; d++) {
      xi[d] = pos[i * dim + d];
      double dx = (proposal == 0) ? rng.normal() * step
                                  : (2.0 * rng.uniform() - 1.0) * step;
      xn[d] = wrap(xi[d] + dx, box);
    }
    bool ov_old = false, ov_new = false;
    double e_old = particle_energy(pos, n, dim, i, xi, box, m, &ov_old);
    double e_new = particle_energy(pos, n, dim, i, xn, box, m, &ov_new);
    bool accept;
    if (ov_new) {
      accept = false;
    } else if (m.kind == 1) {
      accept = true;  // hard core: no energy scale
    } else {
      double de = e_new - e_old;
      accept = (de <= 0.0) || (rng.uniform() < std::exp(-beta * de));
    }
    if (accept) {
      for (int d = 0; d < dim; d++) pos[i * dim + d] = xn[d];
      accepted++;
    }
  }
  return accepted;
}

// g(r) pair histogram: counts[k] over r < r_max in n_bins bins.
void mcjax_gr_histogram(int dim, int n, const double* pos, double box,
                        double r_max, int n_bins, long long* counts) {
  std::memset(counts, 0, sizeof(long long) * n_bins);
  double dr = r_max / n_bins;
  for (int i = 0; i < n; i++)
    for (int j = i + 1; j < n; j++) {
      double r2 = 0.0;
      for (int d = 0; d < dim; d++) {
        double del = min_image(pos[i * dim + d] - pos[j * dim + d], box);
        r2 += del * del;
      }
      double r = std::sqrt(r2);
      if (r < r_max) counts[(int)(r / dr)]++;
    }
}

}  // extern "C"
