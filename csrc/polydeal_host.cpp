// polydeal_host — native host-side mesh/graph kernels.
//
// The reference's setup path is C++ throughout (deal.II triangulation
// connectivity, METIS partitioning, boost R-tree packing); this library is
// the TPU-framework equivalent: the host-side graph-builder that produces
// the static gather maps the device programs consume.  Exposed as a plain
// C ABI consumed through ctypes (polydeal_tpu/native.py), with numpy
// fallbacks when the shared object is absent.
//
// Kernels:
//   pd_face_neighbors     — fine-face matching via hashing
//                           (replaces deal.II face identification)
//   pd_connected_components — union-find over same-label face edges
//                           (reference Utils::compute_connected_components,
//                            include/utils.h:1841-1915)
//   pd_greedy_partition   — BFS region growing k-way partition
//                           (METIS-path analogue, poly_utils.h:553-704)
//   pd_str_tile           — sort-tile-recursive grouping (boost R-tree
//                           STR packing analogue, agglomerator.h)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Face neighbor matching.
// cells:   [n_cells * nv_cell] vertex ids
// face_v:  [n_faces_per_cell * nv_face] local vertex indices per face
// out:     [n_cells * n_faces_per_cell] neighbor cell (-1 = boundary)
int pd_face_neighbors(const int32_t* cells, int64_t n_cells, int32_t nv_cell,
                      const int32_t* face_v, int32_t n_faces_per_cell,
                      int32_t nv_face, int64_t* out) {
  const int64_t n_faces = n_cells * n_faces_per_cell;
  struct Key {
    int32_t v[8];
  };
  struct KeyHash {
    int32_t nv;
    size_t operator()(const Key& k) const {
      size_t h = 1469598103934665603ull;
      for (int i = 0; i < nv; ++i) {
        h ^= (size_t)k.v[i];
        h *= 1099511628211ull;
      }
      return h;
    }
  };
  struct KeyEq {
    int32_t nv;
    bool operator()(const Key& a, const Key& b) const {
      return std::memcmp(a.v, b.v, nv * sizeof(int32_t)) == 0;
    }
  };
  if (nv_face > 8) return -1;
  std::unordered_map<Key, int64_t, KeyHash, KeyEq> first(
      2 * (size_t)n_faces, KeyHash{nv_face}, KeyEq{nv_face});
  std::fill(out, out + n_faces, -1);
  for (int64_t c = 0; c < n_cells; ++c) {
    for (int32_t f = 0; f < n_faces_per_cell; ++f) {
      Key k{};
      for (int32_t i = 0; i < nv_face; ++i)
        k.v[i] = cells[c * nv_cell + face_v[f * nv_face + i]];
      std::sort(k.v, k.v + nv_face);
      const int64_t id = c * n_faces_per_cell + f;
      auto it = first.find(k);
      if (it == first.end()) {
        first.emplace(k, id);
      } else {
        const int64_t other = it->second;
        out[id] = other / n_faces_per_cell;
        out[other] = c;
        first.erase(it);
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// Connected components of same-label subgraphs (union-find).
// labels: [n] polytope label per cell; neighbors: [n * nf] (-1 = none).
// out:    [n] new compact labels, components split, ordered by first cell.
int pd_connected_components(const int32_t* labels, const int64_t* neighbors,
                            int64_t n, int32_t nf, int32_t* out) {
  std::vector<int64_t> parent(n);
  std::iota(parent.begin(), parent.end(), 0);
  std::vector<int64_t>* pp = &parent;
  auto find = [pp](int64_t x) {
    auto& p = *pp;
    while (p[x] != x) {
      p[x] = p[p[x]];
      x = p[x];
    }
    return x;
  };
  for (int64_t c = 0; c < n; ++c) {
    for (int32_t f = 0; f < nf; ++f) {
      const int64_t nb = neighbors[c * nf + f];
      if (nb >= 0 && labels[nb] == labels[c]) {
        int64_t a = find(c), b = find(nb);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
      }
    }
  }
  std::unordered_map<int64_t, int32_t> compact;
  compact.reserve(n);
  int32_t next = 0;
  for (int64_t c = 0; c < n; ++c) {
    const int64_t r = find(c);
    auto it = compact.find(r);
    if (it == compact.end()) {
      compact.emplace(r, next);
      out[c] = next++;
    } else {
      out[c] = it->second;
    }
  }
  return next;
}

// ---------------------------------------------------------------------
// Greedy BFS k-way partition (METIS-like region growing).
int pd_greedy_partition(const int64_t* neighbors, int64_t n, int32_t nf,
                        int32_t n_parts, int32_t* out) {
  std::fill(out, out + n, -1);
  const int64_t target = (n + n_parts - 1) / n_parts;
  int64_t assigned = 0, seed = 0;
  for (int32_t part = 0; part < n_parts && assigned < n; ++part) {
    while (seed < n && out[seed] >= 0) ++seed;
    if (seed >= n) break;
    std::queue<int64_t> q;
    q.push(seed);
    out[seed] = part;
    ++assigned;
    int64_t count = 1;
    while (!q.empty() && count < target) {
      const int64_t c = q.front();
      q.pop();
      for (int32_t f = 0; f < nf && count < target; ++f) {
        const int64_t nb = neighbors[c * nf + f];
        if (nb >= 0 && out[nb] < 0) {
          out[nb] = part;
          ++count;
          ++assigned;
          q.push(nb);
        }
      }
    }
  }
  // leftovers: attach to an assigned neighbor (sweep until stable)
  bool progress = true;
  while (progress) {
    progress = false;
    for (int64_t c = 0; c < n; ++c) {
      if (out[c] >= 0) continue;
      for (int32_t f = 0; f < nf; ++f) {
        const int64_t nb = neighbors[c * nf + f];
        if (nb >= 0 && out[nb] >= 0) {
          out[c] = out[nb];
          progress = true;
          break;
        }
      }
    }
    int64_t left = 0;
    for (int64_t c = 0; c < n; ++c)
      if (out[c] < 0) ++left;
    if (left == 0) break;
    if (!progress) {  // disconnected leftovers: dump into last part
      for (int64_t c = 0; c < n; ++c)
        if (out[c] < 0) out[c] = n_parts - 1;
      break;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// Sort-tile-recursive grouping of points into n_groups labels.
static void str_rec(const double* pts, int dim, int64_t* idx, int64_t n,
                    int32_t k, int axis, int32_t base, int64_t* labels) {
  if (k <= 1 || n == 0) {
    for (int64_t i = 0; i < n; ++i) labels[idx[i]] = base;
    return;
  }
  std::sort(idx, idx + n, [pts, dim, axis](int64_t a, int64_t b) {
    return pts[a * dim + axis] < pts[b * dim + axis];
  });
  const int rem = dim - axis;
  if (rem <= 1) {
    for (int32_t g = 0; g < k; ++g) {
      const int64_t lo = n * g / k, hi = n * (g + 1) / k;
      for (int64_t i = lo; i < hi; ++i) labels[idx[i]] = base + g;
    }
    return;
  }
  int32_t s = (int32_t)std::ceil(std::pow((double)k, 1.0 / rem));
  if (s > k) s = k;
  std::vector<int32_t> per(s);
  for (int32_t i = 0; i < s; ++i) per[i] = k / s + (i < k % s ? 1 : 0);
  int64_t lo = 0;
  int64_t acc = 0;
  int32_t gbase = base;
  for (int32_t i = 0; i < s; ++i) {
    acc += per[i];
    const int64_t hi = (int64_t)std::llround((double)n * acc / k);
    str_rec(pts, dim, idx + lo, hi - lo, per[i], axis + 1, gbase, labels);
    gbase += per[i];
    lo = hi;
  }
}

int pd_str_tile(const double* pts, int64_t n, int32_t dim, int32_t n_groups,
                int64_t* labels) {
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  str_rec(pts, dim, idx.data(), n, n_groups, 0, 0, labels);
  return 0;
}

// ---------------------------------------------------------------------
// Recursive STR leaf ordering: rank[i] = position of point i in the
// depth-first traversal of the fanout-way STR tile tree.  Every
// fanout^k-aligned chunk of ranks is a compact spatial tile, so the whole
// R-tree hierarchy becomes rank // fanout^k — children of a node are a
// contiguous rank range at every level (the property the TPU transfer
// fast path and banded SpMV offsets rely on).
static void leaf_rec(const double* pts, int dim, int64_t* idx, int64_t n,
                     int32_t fanout, int64_t* rank, int64_t* counter) {
  if (n <= 1) {
    for (int64_t i = 0; i < n; ++i) rank[idx[i]] = (*counter)++;
    return;
  }
  const int32_t k = (int32_t)std::min<int64_t>(fanout, n);
  // label points into k tiles (tile ids are in spatial order)
  std::vector<int64_t> labels(n);
  {
    // str_rec works on original-index labels; build a local copy
    std::vector<int64_t> local(n);
    std::iota(local.begin(), local.end(), 0);
    std::vector<double> sub((size_t)n * dim);
    for (int64_t i = 0; i < n; ++i)
      for (int d = 0; d < dim; ++d) sub[i * dim + d] = pts[idx[i] * dim + d];
    str_rec(sub.data(), dim, local.data(), n, k, 0, 0, labels.data());
  }
  // bucket by tile, preserving spatial tile order
  std::vector<std::vector<int64_t>> buckets(k);
  for (int64_t i = 0; i < n; ++i) buckets[labels[i]].push_back(idx[i]);
  for (int32_t g = 0; g < k; ++g)
    leaf_rec(pts, dim, buckets[g].data(), (int64_t)buckets[g].size(), fanout,
             rank, counter);
}

int pd_str_leaf_order(const double* pts, int64_t n, int32_t dim,
                      int32_t fanout, int64_t* rank) {
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  int64_t counter = 0;
  leaf_rec(pts, dim, idx.data(), n, fanout, rank, &counter);
  return 0;
}

// ---------------------------------------------------------------------
// Vanek greedy aggregation on a CSR strength graph (the smoothed-
// aggregation AMG setup hot loop; sequential 3-pass semantics must
// match the numpy fallback in solvers/amg.py::_aggregate exactly).
// indptr [n+1], indices [nnz]; out: aggregate label per node.
// Returns n_agg, or -1 on bad input.
int pd_sa_aggregate(const int64_t* indptr, const int64_t* indices, int64_t n,
                    int32_t* out) {
  if (n < 0) return -1;
  std::fill(out, out + n, -1);
  int32_t n_agg = 0;
  // pass 1: untouched nodes with fully-untouched strong neighborhoods
  // seed an aggregate containing that whole neighborhood
  for (int64_t i = 0; i < n; ++i) {
    if (out[i] != -1) continue;
    bool clean = true;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
      if (out[indices[k]] != -1) {
        clean = false;
        break;
      }
    if (clean) {
      out[i] = n_agg;
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
        out[indices[k]] = n_agg;
      ++n_agg;
    }
  }
  // pass 2: join the first tagged strong neighbor (current labels)
  for (int64_t i = 0; i < n; ++i) {
    if (out[i] != -1) continue;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t l = out[indices[k]];
      if (l != -1) {
        out[i] = l;
        break;
      }
    }
  }
  // pass 3: leftovers form singleton aggregates
  for (int64_t i = 0; i < n; ++i)
    if (out[i] == -1) out[i] = n_agg++;
  return n_agg;
}

}  // extern "C"
