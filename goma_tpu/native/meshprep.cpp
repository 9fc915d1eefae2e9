// Native mesh-preprocessing kernels.
//
// Parity: the reference's native decomposition layer — METIS element
// partitioning (src/metis_decomp.c:372 goma_metis_decomposition) and the
// C++ ghost/graph builders (src/dp_ghost.cpp). TPU-first replacements:
//
//  - rcb_partition: recursive coordinate bisection of element centroids
//    into nparts balanced, spatially-compact parts (drives the shard_map
//    element sharding so each device touches a compact dof range).
//  - morton_order: Morton (Z-curve) ordering of element centroids for
//    gather locality on device.
//
// Built with g++ -O3 -shared; bound via ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ----------------------------------------------------------------- RCB
static void rcb_recurse(const double* c, int dim, int64_t* ids, int64_t n,
                        int nparts, int part0, int32_t* out) {
  if (nparts <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) out[ids[i]] = part0;
    return;
  }
  // split along the widest extent
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i) {
    const double* p = c + ids[i] * dim;
    for (int d = 0; d < dim; ++d) {
      lo[d] = std::min(lo[d], p[d]);
      hi[d] = std::max(hi[d], p[d]);
    }
  }
  int axis = 0;
  for (int d = 1; d < dim; ++d)
    if (hi[d] - lo[d] > hi[axis] - lo[axis]) axis = d;

  int left_parts = nparts / 2;
  int64_t nleft = (int64_t)((double)n * left_parts / nparts + 0.5);
  nleft = std::max<int64_t>(1, std::min(n - 1, nleft));
  std::nth_element(ids, ids + nleft, ids + n, [&](int64_t a, int64_t b) {
    return c[a * dim + axis] < c[b * dim + axis];
  });
  rcb_recurse(c, dim, ids, nleft, left_parts, part0, out);
  rcb_recurse(c, dim, ids + nleft, n - nleft, nparts - left_parts,
              part0 + left_parts, out);
}

void rcb_partition(const double* centroids, int64_t n, int dim, int nparts,
                   int32_t* part_out) {
  std::vector<int64_t> ids(n);
  std::iota(ids.begin(), ids.end(), 0);
  rcb_recurse(centroids, dim, ids.data(), n, nparts, 0, part_out);
}

// --------------------------------------------------------------- Morton
static inline uint64_t spread3(uint64_t x) {
  x &= 0x1fffff;
  x = (x | x << 32) & 0x1f00000000ffffULL;
  x = (x | x << 16) & 0x1f0000ff0000ffULL;
  x = (x | x << 8) & 0x100f00f00f00f00fULL;
  x = (x | x << 4) & 0x10c30c30c30c30c3ULL;
  x = (x | x << 2) & 0x1249249249249249ULL;
  return x;
}
static inline uint64_t spread2(uint64_t x) {
  x &= 0xffffffff;
  x = (x | x << 16) & 0x0000ffff0000ffffULL;
  x = (x | x << 8) & 0x00ff00ff00ff00ffULL;
  x = (x | x << 4) & 0x0f0f0f0f0f0f0f0fULL;
  x = (x | x << 2) & 0x3333333333333333ULL;
  x = (x | x << 1) & 0x5555555555555555ULL;
  return x;
}

void morton_order(const double* centroids, int64_t n, int dim,
                  int64_t* order_out) {
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < dim; ++d) {
      double v = centroids[i * dim + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  std::vector<uint64_t> keys(n);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t k = 0;
    if (dim == 2) {
      for (int d = 0; d < 2; ++d) {
        double s = (hi[d] > lo[d]) ? (centroids[i * dim + d] - lo[d]) / (hi[d] - lo[d]) : 0.0;
        uint64_t q = (uint64_t)(s * 4294967295.0);
        k |= spread2(q) << d;
      }
    } else {
      for (int d = 0; d < dim; ++d) {
        double s = (hi[d] > lo[d]) ? (centroids[i * dim + d] - lo[d]) / (hi[d] - lo[d]) : 0.0;
        uint64_t q = (uint64_t)(s * 2097151.0);
        k |= spread3(q) << d;
      }
    }
    keys[i] = k;
  }
  std::iota(order_out, order_out + n, (int64_t)0);
  std::sort(order_out, order_out + n,
            [&](int64_t a, int64_t b) { return keys[a] < keys[b]; });
}

}  // extern "C"
