// dtmgen — native ground-extraction (DTM) component.
//
// TPU-native replacement for the reference's proprietary `DTMGeneration`
// binary ("RoamesDTMGenerator"), which is invoked but not vendored by the
// reference (/root/reference/prepare_data/dtm.py:10-20, :86-95). Implements
// the same CLI and output contract:
//
//   dtmgen <points.txt> <outdir> <region.txt> <cell_size>
//          <seed_cell_size> <boundary_block_width>
//          <detect_water: true|false> <remove_buildings: true|false>
//          <dump_tin_ply: true|false>
//
//   points.txt : whitespace rows, first 3 columns x y z
//   region.txt : "min_x min_y max_x max_y" (square region)
//   output     : <outdir>/dtm_<int(min_x)>_<int(min_y)>.dat — float32 grid,
//                edge = floor(width/cell + 0.5), file[col*edge + row] is the
//                ground height at (x = min_x + row*cell, y = min_y + col*cell)
//                (layout per the reference reader, dtm.py:115-122);
//                no-data = -1e4.  Optional <outdir>/tin_<..>.ply grid mesh.
//
// Algorithm (identical to dgcnn_tpu/prepare/dtm.py:dtm_grid — the numpy
// fallback; both are tested against each other):
//   1. rasterise min-z per cell;
//   2. seed ground: min cell of every seed-block + boundary strips;
//   3. coarse-to-fine densification: halve block each level, accept cells
//      within (0.3 + 0.05*block*cell) m of the pull-push interpolated
//      surface (skipped when remove_buildings=false — all data is ground);
//   4. final pull-push interpolation; no-data outside a 3-cell dilation of
//      coverage; detect_water floods interior holes at boundary-min height.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <functional>
#include <thread>
#include <limits>
#include <sstream>
#include <string>
#include <vector>

namespace {

constexpr float kNoData = -1e4f;
constexpr double kInf = std::numeric_limits<double>::infinity();

struct Grid {
  int edge = 0;
  std::vector<double> v;  // row-major: v[row*edge + col], row = x index
  double& at(int r, int c) { return v[size_t(r) * edge + c]; }
  double at(int r, int c) const { return v[size_t(r) * edge + c]; }
};

struct Mask {
  int edge = 0;
  std::vector<uint8_t> v;
  uint8_t& at(int r, int c) { return v[size_t(r) * edge + c]; }
  uint8_t at(int r, int c) const { return v[size_t(r) * edge + c]; }
};

// pull-push pyramid interpolation: downsample (sum, weight) until 1x1-ish,
// then upsample filling unknown cells from the coarser level. Mirrors
// _pull_push_fill in dgcnn_tpu/prepare/dtm.py.
std::vector<double> PullPushFill(const Grid& height, const Mask& known) {
  struct Level {
    int rows, cols;
    std::vector<double> h, w;
  };
  std::vector<Level> levels;
  {
    Level l0;
    l0.rows = l0.cols = height.edge;
    l0.h.resize(height.v.size());
    l0.w.resize(height.v.size());
    for (size_t i = 0; i < height.v.size(); ++i) {
      l0.h[i] = known.v[i] ? height.v[i] : 0.0;
      l0.w[i] = known.v[i] ? 1.0 : 0.0;
    }
    levels.push_back(std::move(l0));
  }
  while (levels.back().rows > 1 || levels.back().cols > 1) {
    const Level& p = levels.back();
    Level n;
    n.rows = (p.rows + 1) / 2;
    n.cols = (p.cols + 1) / 2;
    n.h.assign(size_t(n.rows) * n.cols, 0.0);
    n.w.assign(size_t(n.rows) * n.cols, 0.0);
    for (int r = 0; r < p.rows; ++r)
      for (int c = 0; c < p.cols; ++c) {
        size_t dst = size_t(r / 2) * n.cols + (c / 2);
        n.h[dst] += p.h[size_t(r) * p.cols + c];
        n.w[dst] += p.w[size_t(r) * p.cols + c];
      }
    levels.push_back(std::move(n));
  }
  // top level: weighted value where known
  std::vector<double> filled(levels.back().h.size());
  for (size_t i = 0; i < filled.size(); ++i)
    filled[i] = levels.back().w[i] > 0
                    ? levels.back().h[i] / std::max(levels.back().w[i], 1e-12)
                    : 0.0;
  for (int li = int(levels.size()) - 2; li >= 0; --li) {
    const Level& l = levels[li];
    const Level& coarse = levels[li + 1];
    std::vector<double> cur(size_t(l.rows) * l.cols);
    for (int r = 0; r < l.rows; ++r)
      for (int c = 0; c < l.cols; ++c) {
        size_t i = size_t(r) * l.cols + c;
        if (l.w[i] > 0)
          cur[i] = l.h[i] / std::max(l.w[i], 1e-12);
        else
          cur[i] = filled[size_t(r / 2) * coarse.cols + (c / 2)];
      }
    filled.swap(cur);
  }
  return filled;
}

// Split [0, n) across hardware threads (query loops below are
// embarrassingly parallel: every output element is independent). Small
// inputs stay single-threaded to avoid spawn overhead.
static void ParallelFor(int64_t n, int64_t grain,
                        const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int nt = int(std::max(1u, std::min(hw ? hw : 1u, 16u)));
  if (nt == 1 || n < grain * 2) {
    fn(0, n);
    return;
  }
  nt = int(std::min<int64_t>(nt, std::max<int64_t>(1, n / grain)));
  std::vector<std::thread> ts;
  ts.reserve(nt - 1);
  const int64_t per = (n + nt - 1) / nt;
  for (int t = 1; t < nt; ++t) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  fn(0, std::min<int64_t>(per, n));
  for (auto& th : ts) th.join();
}

void AcceptBlockMinima(const Grid& minz, const Mask& has_data,
                       const Mask& region, int block, Mask* ground) {
  int edge = minz.edge;
  for (int bi = 0; bi < edge; bi += block)
    for (int bj = 0; bj < edge; bj += block) {
      double best = kInf;
      int br = -1, bc = -1;
      for (int r = bi; r < std::min(bi + block, edge); ++r)
        for (int c = bj; c < std::min(bj + block, edge); ++c)
          if (has_data.at(r, c) && region.at(r, c) && minz.at(r, c) < best) {
            best = minz.at(r, c);
            br = r;
            bc = c;
          }
      if (br >= 0) ground->at(br, bc) = 1;
    }
}

Mask Dilate(const Mask& m, int iters) {
  Mask cur = m, next = m;
  int e = m.edge;
  for (int it = 0; it < iters; ++it) {
    for (int r = 0; r < e; ++r)
      for (int c = 0; c < e; ++c) {
        uint8_t v = cur.at(r, c);
        if (r > 0) v |= cur.at(r - 1, c);
        if (r + 1 < e) v |= cur.at(r + 1, c);
        if (c > 0) v |= cur.at(r, c - 1);
        if (c + 1 < e) v |= cur.at(r, c + 1);
        next.at(r, c) = v;
      }
    std::swap(cur.v, next.v);
  }
  return cur;
}

void FillWaterHoles(std::vector<float>* out, int edge) {
  // INTERIOR no-data holes -> min of adjacent valid heights, sweeping
  // inward. No-data regions 4-connected to the grid border (the
  // out-of-coverage margin) are NOT water and stay no-data — filling
  // them would fabricate terrain over the empty part of the region.
  // Double-buffered (Jacobi): each iteration reads only the previous
  // iteration's grid, matching the numpy twin (_fill_water_holes in
  // dgcnn_tpu/prepare/dtm.py) — an in-place sweep would propagate values
  // right/down within one pass and fill asymmetric multi-cell holes with
  // different heights.
  const size_t n = size_t(edge) * edge;
  // exterior mask: BFS over no-data cells from the border (equivalent to
  // the numpy twin's dilation-to-fixpoint)
  std::vector<uint8_t> exterior(n, 0);
  std::vector<size_t> stack;
  auto push_if_hole = [&](int r, int c) {
    size_t i = size_t(r) * edge + c;
    if ((*out)[i] == kNoData && !exterior[i]) {
      exterior[i] = 1;
      stack.push_back(i);
    }
  };
  for (int r = 0; r < edge; ++r) {
    push_if_hole(r, 0);
    push_if_hole(r, edge - 1);
  }
  for (int c = 0; c < edge; ++c) {
    push_if_hole(0, c);
    push_if_hole(edge - 1, c);
  }
  while (!stack.empty()) {
    size_t i = stack.back();
    stack.pop_back();
    int r = int(i / edge), c = int(i % edge);
    if (r > 0) push_if_hole(r - 1, c);
    if (r + 1 < edge) push_if_hole(r + 1, c);
    if (c > 0) push_if_hole(r, c - 1);
    if (c + 1 < edge) push_if_hole(r, c + 1);
  }

  std::vector<float> prev(*out);
  for (int it = 0; it < edge; ++it) {
    bool changed = false;
    for (int r = 0; r < edge; ++r)
      for (int c = 0; c < edge; ++c) {
        size_t i = size_t(r) * edge + c;
        if (prev[i] != kNoData || exterior[i]) continue;
        float best = std::numeric_limits<float>::infinity();
        auto consider = [&](int rr, int cc) {
          if (rr < 0 || cc < 0 || rr >= edge || cc >= edge) return;
          float v = prev[size_t(rr) * edge + cc];
          if (v != kNoData && v < best) best = v;
        };
        consider(r - 1, c);
        consider(r + 1, c);
        consider(r, c - 1);
        consider(r, c + 1);
        if (std::isfinite(best)) {
          (*out)[i] = best;
          changed = true;
        }
      }
    if (!changed) break;
    prev = *out;
  }
}

void ComputeDtm(const double* xyz, int64_t n, double min_x, double min_y,
                double cell, int edge, double seed_cell, int boundary_width,
                bool water, bool buildings, float* out /* row-major */) {
  Grid minz;
  minz.edge = edge;
  minz.v.assign(size_t(edge) * edge, kInf);
  Mask has_data;
  has_data.edge = edge;
  has_data.v.assign(size_t(edge) * edge, 0);
  for (int64_t i = 0; i < n; ++i) {
    double x = xyz[i * 3], y = xyz[i * 3 + 1], z = xyz[i * 3 + 2];
    int r = int(std::floor((x - min_x) / cell));
    int c = int(std::floor((y - min_y) / cell));
    if (r < 0 || c < 0 || r >= edge || c >= edge) continue;
    if (z < minz.at(r, c)) minz.at(r, c) = z;
    has_data.at(r, c) = 1;
  }
  for (auto& v : minz.v)
    if (v == kInf) v = 0.0;

  Mask ground;
  ground.edge = edge;
  ground.v.assign(size_t(edge) * edge, 0);
  Mask everywhere;
  everywhere.edge = edge;
  everywhere.v.assign(size_t(edge) * edge, 1);
  const int seed_cells = std::max(int(std::lround(seed_cell / cell)), 1);
  AcceptBlockMinima(minz, has_data, everywhere, seed_cells, &ground);
  {
    Mask border;
    border.edge = edge;
    border.v.assign(size_t(edge) * edge, 0);
    int bb = std::max(boundary_width, 1);
    for (int r = 0; r < edge; ++r)
      for (int c = 0; c < edge; ++c)
        if (r < bb || c < bb || r >= edge - bb || c >= edge - bb)
          border.at(r, c) = 1;
    AcceptBlockMinima(minz, has_data, border, std::max(seed_cells / 4, 1),
                      &ground);
  }

  if (buildings) {
    for (int block = seed_cells / 2; block >= 1; block /= 2) {
      std::vector<double> surf = PullPushFill(minz, ground);
      const double tol = 0.3 + 0.05 * block * cell;
      for (size_t i = 0; i < minz.v.size(); ++i)
        if (has_data.v[i] && !ground.v[i] &&
            std::fabs(minz.v[i] - surf[i]) <= tol)
          ground.v[i] = 1;
      if (block == 1) break;
    }
  } else {
    ground.v = has_data.v;
  }

  std::fill(out, out + size_t(edge) * edge, kNoData);
  bool any_ground = false;
  for (auto g : ground.v) any_ground |= (g != 0);
  if (any_ground) {
    std::vector<double> surf = PullPushFill(minz, ground);
    Mask cover = Dilate(has_data, 3);
    for (size_t i = 0; i < size_t(edge) * edge; ++i)
      if (cover.v[i]) out[i] = float(surf[i]);
    if (water) {
      std::vector<float> tmp(out, out + size_t(edge) * edge);
      FillWaterHoles(&tmp, edge);
      std::copy(tmp.begin(), tmp.end(), out);
    }
  }
}

}  // namespace

// In-memory API for ctypes binding (dgcnn_tpu/prepare/dtm.py): no temp
// files, no text parsing. xyz is an (n, 3) row-major double array; out is a
// preallocated edge*edge float32 buffer filled row-major (out[r*edge + c] =
// height at x = min_x + r*cell, y = min_y + c*cell). Returns the edge size.
extern "C" int dtmgen_compute(const double* xyz, int64_t n, double min_x,
                              double min_y, double width, double cell,
                              double seed_cell, int boundary_width,
                              int detect_water, int remove_buildings,
                              float* out) {
  const int edge = int(std::floor(width / cell + 0.5));
  if (edge <= 0) return 0;
  ComputeDtm(xyz, n, min_x, min_y, cell, edge, seed_cell, boundary_width,
             detect_water != 0, remove_buildings != 0, out);
  return edge;
}

// ---------------------------------------------------------------------------
// Spatial-hash neighbour kernels (ctypes API, dgcnn_tpu/prepare/{noise,dtm}).
//
// The reference pays a KDTree for two host-side passes: the isolated-point
// noise filter (2-NN over the full cloud, process_data.py:115-121) and the
// AGL k-NN ground-height mean (dtm.py:140-160). On the single-core hosts
// this framework targets, a uniform-grid hash gives the same EXACT answers
// in O(n) instead of O(n log n) with large constants. Both kernels sort
// point indices by packed cell key, then probe neighbouring cells with
// early termination.

namespace {

// Dense counting-sort cell index: O(1) probe per cell. Cell count is
// bounded by the cloud's bounding box / cell size; callers keep cell sizes
// at the problem's natural scale so ncell stays O(n) (guarded anyway).
struct CellIndex {
  int64_t nx = 0, ny = 0, nz = 0;
  double ox = 0, oy = 0, oz = 0, cell = 1.0;
  std::vector<int64_t> starts;  // ncell+1 prefix offsets into `order`
  std::vector<int64_t> order;   // point indices grouped by cell

  // cells clamp to the index box: far-outlier points collapse into edge
  // cells. Clamping is monotone, so points within one true cell of each
  // other stay within one clamped cell — probes only gain false
  // candidates, never lose true ones.
  int64_t cid(int64_t ix, int64_t iy, int64_t iz) const {
    ix = std::max<int64_t>(0, std::min(ix, nx - 1));
    iy = std::max<int64_t>(0, std::min(iy, ny - 1));
    iz = std::max<int64_t>(0, std::min(iz, nz - 1));
    return (ix * ny + iy) * nz + iz;
  }
  // probe: out-of-range cells are EMPTY (clamping applies to binning
  // only — a clamped probe would re-scan an already-visited edge cell and
  // double-count its points)
  std::pair<int64_t, int64_t> range(int64_t ix, int64_t iy,
                                    int64_t iz) const {
    if (ix < 0 || iy < 0 || iz < 0 || ix >= nx || iy >= ny || iz >= nz)
      return {0, 0};
    int64_t c = cid(ix, iy, iz);
    return {starts[c], starts[c + 1]};
  }
};

// Build over n points with `stride` doubles per row, using the first
// `dims` coordinates (z fixed to 0 for 2-D). Returns false if the grid
// would be degenerate.
bool BuildIndex(const double* pts, int64_t n, int stride, int dims,
                double cell, CellIndex* out) {
  double lo[3] = {0, 0, 0}, hi[3] = {0, 0, 0};
  for (int d = 0; d < dims; ++d) lo[d] = hi[d] = pts[d];
  for (int64_t i = 1; i < n; ++i)
    for (int d = 0; d < dims; ++d) {
      lo[d] = std::min(lo[d], pts[i * stride + d]);
      hi[d] = std::max(hi[d], pts[i * stride + d]);
    }
  out->ox = lo[0];
  out->oy = lo[1];
  out->oz = lo[2];
  out->cell = cell;
  auto dim = [&](int d) {
    return int64_t(std::floor((hi[d] - lo[d]) / cell)) + 1;
  };
  out->nx = dims > 0 ? dim(0) : 1;
  out->ny = dims > 1 ? dim(1) : 1;
  out->nz = dims > 2 ? dim(2) : 1;
  // cap the dense table at O(n) cells by halving the largest dimension;
  // out-of-range cells clamp to the edges (see cid())
  const int64_t limit = std::max<int64_t>(16 * n, int64_t(1) << 20);
  while (out->nx * out->ny * out->nz > limit) {
    int64_t* big = &out->nx;
    if (out->ny > *big) big = &out->ny;
    if (out->nz > *big) big = &out->nz;
    *big = (*big + 1) / 2;
  }
  int64_t ncell = out->nx * out->ny * out->nz;
  if (ncell <= 0) return false;
  std::vector<int64_t> cells(n);
  std::vector<int64_t> counts(ncell + 1, 0);
  const double o[3] = {out->ox, out->oy, out->oz};
  for (int64_t i = 0; i < n; ++i) {
    int64_t ix[3] = {0, 0, 0};
    for (int d = 0; d < dims; ++d)
      ix[d] = int64_t(std::floor((pts[i * stride + d] - o[d]) / cell));
    cells[i] = out->cid(ix[0], ix[1], ix[2]);
    ++counts[cells[i] + 1];
  }
  for (int64_t c = 0; c < ncell; ++c) counts[c + 1] += counts[c];
  out->starts = counts;
  out->order.resize(n);
  std::vector<int64_t> cursor(out->starts.begin(), out->starts.end() - 1);
  for (int64_t i = 0; i < n; ++i) out->order[cursor[cells[i]]++] = i;
  return true;
}

}  // namespace

// keep[i] = 1 iff the nearest OTHER point is strictly closer than max_dist
// (exact, identical to `KDTree.query(k=2).dists[:,1] < max_dist`).
extern "C" int dtmgen_noise_mask(const double* xyz, int64_t n,
                                 double max_dist, uint8_t* keep) {
  if (n < 2) {
    for (int64_t i = 0; i < n; ++i) keep[i] = 1;
    return 0;
  }
  CellIndex ci;
  if (!BuildIndex(xyz, n, 3, 3, max_dist, &ci))
    return 1;  // caller falls back to the KDTree path
  const double max_sq = max_dist * max_dist;
  // probe own cell first (most points early-exit there), then the 26
  // neighbours; iterate queries in cell order for cache locality
  static const int kOff[27][3] = {
      {0, 0, 0},    {0, 0, -1},  {0, 0, 1},   {0, -1, 0},  {0, 1, 0},
      {-1, 0, 0},   {1, 0, 0},   {0, -1, -1}, {0, -1, 1},  {0, 1, -1},
      {0, 1, 1},    {-1, 0, -1}, {-1, 0, 1},  {1, 0, -1},  {1, 0, 1},
      {-1, -1, 0},  {-1, 1, 0},  {1, -1, 0},  {1, 1, 0},   {-1, -1, -1},
      {-1, -1, 1},  {-1, 1, -1}, {-1, 1, 1},  {1, -1, -1}, {1, -1, 1},
      {1, 1, -1},   {1, 1, 1}};
  auto clamp = [](int64_t v, int64_t n_) {
    return std::max<int64_t>(0, std::min(v, n_ - 1));
  };
  // Cell-ordered coordinate copy: candidate scans become CONTIGUOUS reads
  // (the original xyz is in arbitrary order, so order[s] indirection made
  // every candidate a cache miss — measured 2.4x slower at 400k points).
  // One extra parallel 9.6 MB/400k-pt sequential pass buys it.
  std::vector<double> sx(n), sy(n), sz(n);
  ParallelFor(n, 65536, [&](int64_t lo, int64_t hi) {
    for (int64_t s = lo; s < hi; ++s) {
      const int64_t j = ci.order[s];
      sx[s] = xyz[j * 3];
      sy[s] = xyz[j * 3 + 1];
      sz[s] = xyz[j * 3 + 2];
    }
  });
  ParallelFor(n, 20000, [&](int64_t lo, int64_t hi) {
  for (int64_t slot = lo; slot < hi; ++slot) {
    const double px = sx[slot], py = sy[slot], pz = sz[slot];
    const int64_t cx =
        clamp(int64_t(std::floor((px - ci.ox) / ci.cell)), ci.nx);
    const int64_t cy =
        clamp(int64_t(std::floor((py - ci.oy) / ci.cell)), ci.ny);
    const int64_t cz =
        clamp(int64_t(std::floor((pz - ci.oz) / ci.cell)), ci.nz);
    bool found = false;
    for (int o = 0; o < 27 && !found; ++o) {
      auto r = ci.range(cx + kOff[o][0], cy + kOff[o][1], cz + kOff[o][2]);
      for (int64_t s = r.first; s < r.second; ++s) {
        if (s == slot) continue;  // self (slots are unique per point)
        const double ddx = sx[s] - px;
        const double ddy = sy[s] - py;
        const double ddz = sz[s] - pz;
        if (ddx * ddx + ddy * ddy + ddz * ddz < max_sq) {
          found = true;
          break;
        }
      }
    }
    keep[ci.order[slot]] = found ? 1 : 0;
  }
  });
  return 0;
}

// Stable LSD-radix argsort of f64 keys, ascending, ties in input order —
// the EXACT permutation np.argsort(kind="stable") yields (numpy's stable
// float sort is comparison-based, so -0.0 == +0.0 keep input order; the
// monotone bit transform below maps -0.0 onto +0.0's key to match).
// Keys must be NaN-free (coordinates are). ~4x numpy single-core at the
// 400k production tile; feeds prepare/blocks.py::_XYIndex.
extern "C" int dtmgen_argsort_f64(const double* keys, int64_t n,
                                  int64_t* out_idx) {
  if (n < 0) return 1;
  std::vector<uint64_t> k0(static_cast<size_t>(n)),
      k1(static_cast<size_t>(n));
  std::vector<int64_t> i0(static_cast<size_t>(n)),
      i1(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    uint64_t b;
    std::memcpy(&b, &keys[i], 8);
    if ((b << 1) == 0) b = 0;  // -0.0 -> +0.0 (numpy compares them equal)
    k0[size_t(i)] = (b & 0x8000000000000000ull)
                        ? ~b
                        : (b | 0x8000000000000000ull);
    i0[size_t(i)] = i;
  }
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    int64_t count[257] = {0};
    for (int64_t i = 0; i < n; ++i)
      ++count[((k0[size_t(i)] >> shift) & 0xff) + 1];
    for (int b = 0; b < 256; ++b) count[b + 1] += count[b];
    for (int64_t i = 0; i < n; ++i) {
      int64_t& pos = count[(k0[size_t(i)] >> shift) & 0xff];
      k1[size_t(pos)] = k0[size_t(i)];
      i1[size_t(pos)] = i0[size_t(i)];
      ++pos;
    }
    k0.swap(k1);
    i0.swap(i1);
  }
  if (n > 0) std::memcpy(out_idx, i0.data(), size_t(n) * 8);
  return 0;
}

// out[q] = mean z of the k nearest (in XY) of m reference points — exact
// k-NN via expanding square rings over a uniform grid; equidistant points
// resolve to the lower index (ties are measure-zero off grid-degenerate
// queries). Matches gen_agl's KDTree semantics (dtm.py:140-160).
extern "C" int dtmgen_agl_knn(const double* ref_xy, const double* ref_z,
                              int64_t m, const double* q_xy, int64_t nq,
                              int k, double* out_mean) {
  if (m <= 0 || k <= 0) return 1;
  if (k > m) k = int(m);
  double mnx = ref_xy[0], mny = ref_xy[1], mx = ref_xy[0], my = ref_xy[1];
  for (int64_t i = 1; i < m; ++i) {
    mnx = std::min(mnx, ref_xy[i * 2]);
    mny = std::min(mny, ref_xy[i * 2 + 1]);
    mx = std::max(mx, ref_xy[i * 2]);
    my = std::max(my, ref_xy[i * 2 + 1]);
  }
  double extent = std::max(std::max(mx - mnx, my - mny), 1e-9);
  // Cell density: aim for ~tgt*k reference points per cell. Swept on the
  // 400k-point / 15.9k-node production profile (bit-equal at every
  // setting — the ring termination bound is distance-based, independent
  // of the partition): tgt 2.0/1.0/0.5/0.25/0.125 -> 118.7/94.7/71.5/
  // 79.7/78.6 ms. The old tgt=2.0 (~8 nodes/cell) scanned ~72
  // candidates per query in rings 0-1; 0.5 (~2/cell) is the sweet spot
  // between candidate count and ring-iteration overhead. Env override
  // DTMGEN_AGL_CELL_PTS for re-tuning on other grid shapes.
  double tgt = 0.5;
  if (const char* e = std::getenv("DTMGEN_AGL_CELL_PTS")) {
    double v = std::atof(e);
    if (v > 0) tgt = v;
  }
  double cell = extent / std::max(1.0, std::sqrt(double(m) / (tgt * k)));
  CellIndex ci;
  if (!BuildIndex(ref_xy, m, 2, 2, cell, &ci))
    return 1;  // caller falls back to the KDTree path

  const int64_t max_ring = std::max(ci.nx, ci.ny) + 1;
  ParallelFor(nq, 5000, [&](int64_t lo, int64_t hi) {
  std::vector<double> best_d(k);
  std::vector<int64_t> best_i(k);
  for (int64_t q = lo; q < hi; ++q) {
    const double px = q_xy[q * 2], py = q_xy[q * 2 + 1];
    const int64_t cx = std::max<int64_t>(
        0, std::min(int64_t(std::floor((px - ci.ox) / ci.cell)), ci.nx - 1));
    const int64_t cy = std::max<int64_t>(
        0, std::min(int64_t(std::floor((py - ci.oy) / ci.cell)), ci.ny - 1));
    int have = 0;
    double worst = kInf;
    for (int64_t ring = 0; ring <= max_ring; ++ring) {
      // a point in a cell at Chebyshev ring r is >= (r-1)*cell away from
      // anywhere in the centre cell — safe to stop once that exceeds the
      // current kth-best
      if (have == k &&
          double(ring - 1) * ci.cell > std::sqrt(worst))
        break;
      for (int64_t dx = -ring; dx <= ring; ++dx)
        for (int64_t dy = -ring; dy <= ring; ++dy) {
          if (std::max(std::llabs(dx), std::llabs(dy)) != ring) continue;
          auto r = ci.range(cx + dx, cy + dy, 0);
          for (int64_t s = r.first; s < r.second; ++s) {
            const int64_t j = ci.order[s];
            const double ddx = ref_xy[j * 2] - px;
            const double ddy = ref_xy[j * 2 + 1] - py;
            const double d2 = ddx * ddx + ddy * ddy;
            if (have < k) {
              best_d[have] = d2;
              best_i[have] = j;
              ++have;
              if (have == k)
                worst = *std::max_element(best_d.begin(), best_d.end());
            } else if (d2 < worst) {
              int64_t w = std::max_element(best_d.begin(), best_d.end()) -
                          best_d.begin();
              best_d[w] = d2;
              best_i[w] = j;
              worst = *std::max_element(best_d.begin(), best_d.end());
            }
          }
        }
    }
    double sum = 0.0;
    for (int t = 0; t < have; ++t) sum += ref_z[best_i[t]];
    out_mean[q] = have ? sum / have : 0.0;
  }
  });
  return 0;
}

// Single-pass parallel LAS point-record decode (ctypes API, used by
// dgcnn_tpu/io/las.py::read_las). The numpy twin decodes with one strided
// pass per field (~10 full-buffer sweeps: X/Y/Z scale-and-offset, flag
// splits, field copies); this does ONE parallel pass with per-record
// unaligned memcpy loads (free on x86-64). Formats 0-3 and 6-8 — the same
// set as io/las.py::_POINT_DTYPES, tested byte-equal against it
// (tests/test_las_io.py). LAS is little-endian by spec; this decoder
// assumes a little-endian host (the numpy twin is the portable fallback).
//
// gps/rgb output pointers must be null unless the format carries the
// field (checked). record_len may exceed the format's base size (extra
// per-point bytes are skipped, like the numpy twin's opaque padding).
namespace {
// LAS point-record layout by format id (classic 0-3, LAS 1.4 modern 6-8)
struct LasFmt {
  int gps_off = -1, rgb_off = -1, min_len = 0;
  bool modern = false;  // formats 6-8 (extended records)
  bool ok = false;
};
LasFmt LasFmtInfo(int point_format) {
  LasFmt f;
  f.ok = true;
  switch (point_format) {
    case 0: f.min_len = 20; break;
    case 1: f.min_len = 28; f.gps_off = 20; break;
    case 2: f.min_len = 26; f.rgb_off = 20; break;
    case 3: f.min_len = 34; f.gps_off = 20; f.rgb_off = 28; break;
    case 6: f.min_len = 30; f.gps_off = 22; f.modern = true; break;
    case 7:
      f.min_len = 36; f.gps_off = 22; f.rgb_off = 30; f.modern = true;
      break;
    case 8:
      f.min_len = 38; f.gps_off = 22; f.rgb_off = 30; f.modern = true;
      break;
    default: f.ok = false;
  }
  return f;
}
}  // namespace

extern "C" int dtmgen_las_decode(
    const uint8_t* buf, int64_t n, int record_len, int point_format,
    double sx, double sy, double sz, double ox, double oy, double oz,
    double* xs, double* ys, double* zs, uint8_t* cls, uint16_t* intensity,
    uint8_t* ret_num, uint8_t* num_ret, uint16_t* psid, double* gps,
    uint16_t* rgb) {
  const LasFmt fm = LasFmtInfo(point_format);
  if (!fm.ok || record_len < fm.min_len) return 1;
  if ((gps && fm.gps_off < 0) || (rgb && fm.rgb_off < 0)) return 1;
  const int gps_off = fm.gps_off, rgb_off = fm.rgb_off;
  const bool modern = fm.modern;
  const int cls_off = modern ? 16 : 15;
  const int psid_off = modern ? 20 : 18;
  ParallelFor(n, 65536, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* r = buf + i * record_len;
      int32_t xi, yi, zi;
      uint16_t u16v;
      std::memcpy(&xi, r, 4);
      std::memcpy(&yi, r + 4, 4);
      std::memcpy(&zi, r + 8, 4);
      xs[i] = xi * sx + ox;
      ys[i] = yi * sy + oy;
      zs[i] = zi * sz + oz;
      std::memcpy(&u16v, r + 12, 2);
      intensity[i] = u16v;
      const uint8_t fb = r[14];  // classic flags / modern returns byte
      if (modern) {
        ret_num[i] = fb & 0x0F;
        num_ret[i] = (fb >> 4) & 0x0F;
        cls[i] = r[cls_off];
      } else {
        ret_num[i] = fb & 0x07;
        num_ret[i] = (fb >> 3) & 0x07;
        cls[i] = r[cls_off] & 0x1F;  // 5-bit classification field
      }
      std::memcpy(&u16v, r + psid_off, 2);
      psid[i] = u16v;
      if (gps) std::memcpy(&gps[i], r + gps_off, 8);
      if (rgb) std::memcpy(rgb + i * 3, r + rgb_off, 6);
    }
  });
  return 0;
}

// Fused predict-load: decode an uncompressed LAS point-record block,
// noise-filter it (grid-hash 1-NN < max_nn_dist — same kernel as
// dtmgen_noise_mask), and write the COMPACTED (n_kept, width) float64
// feature matrix + int64 labels in ONE native call. Replaces the
// Python chain decode → column-stack → noise mask → boolean compaction
// (dgcnn_tpu/prepare/loaders.py::load_pointcloud; reference semantics:
// /root/reference/prepare_data/process_data.py:96-123) with two passes
// over the record buffer and zero Python-side array traffic.
//
//   extra: n_extra (field_id, out_column) int32 pairs; field ids:
//          0=intensity 1=return_number 2=number_of_returns
//          3=red 4=green 5=blue
//   data:  (n, width) float64, caller-ZEROED (unwritten columns — e.g. a
//          mapped 'agl' the file cannot provide — stay 0, matching the
//          numpy path); rows [n_kept, n) are scratch, slice them off
//   labels:(n,) int64
//
// Returns n_kept, or -1 on error (unsupported format / bad columns /
// rgb field requested from an rgb-less format).
static int64_t LasLoadCore(
    const uint8_t* buf, int64_t n, int record_len, int point_format,
    double sx, double sy, double sz, double ox, double oy, double oz,
    double max_nn_dist, int width, int col_x, int col_y, int col_z,
    const int32_t* extra, int n_extra, double* data, int64_t* labels,
    std::vector<double>* xyz_keep /* compacted triplets, may be null */) {
  const LasFmt fm = LasFmtInfo(point_format);
  if (!fm.ok || record_len < fm.min_len) return -1;
  if (col_x < 0 || col_x >= width || col_y < 0 || col_y >= width ||
      col_z < 0 || col_z >= width)
    return -1;
  for (int e = 0; e < n_extra; ++e) {
    const int fid = extra[2 * e], col = extra[2 * e + 1];
    if (fid < 0 || fid > 5 || col < 0 || col >= width) return -1;
    if (fid >= 3 && fm.rgb_off < 0) return -1;
  }
  if (n == 0) return 0;
  const bool modern = fm.modern;
  const int cls_off = modern ? 16 : 15;

  // pass 1: coordinates (interleaved — the noise index wants xyz triplets)
  std::vector<double> xyz(size_t(n) * 3);
  ParallelFor(n, 65536, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* r = buf + i * record_len;
      int32_t xi, yi, zi;
      std::memcpy(&xi, r, 4);
      std::memcpy(&yi, r + 4, 4);
      std::memcpy(&zi, r + 8, 4);
      xyz[i * 3] = xi * sx + ox;
      xyz[i * 3 + 1] = yi * sy + oy;
      xyz[i * 3 + 2] = zi * sz + oz;
    }
  });

  std::vector<uint8_t> keep(n, 1);
  if (max_nn_dist > 0 && n >= 2) {
    if (dtmgen_noise_mask(xyz.data(), n, max_nn_dist, keep.data()))
      return -1;
  }

  // blocked prefix sum of the keep mask → each block's output offset
  const int64_t block = 1 << 16;
  const int64_t nb = (n + block - 1) / block;
  std::vector<int64_t> off(size_t(nb) + 1, 0);
  ParallelFor(nb, 1, [&](int64_t blo, int64_t bhi) {
    for (int64_t b = blo; b < bhi; ++b) {
      const int64_t lo = b * block, hi = std::min(n, lo + block);
      int64_t cnt = 0;
      for (int64_t i = lo; i < hi; ++i) cnt += keep[i];
      off[b + 1] = cnt;
    }
  });
  for (int64_t b = 0; b < nb; ++b) off[b + 1] += off[b];
  if (xyz_keep) xyz_keep->resize(size_t(off[nb]) * 3);

  // pass 2: compacted row write. Extras first, then xyz — a feature
  // deliberately mapped onto a coordinate column is overwritten by the
  // coordinate, matching loaders.py's assignment order.
  ParallelFor(nb, 1, [&](int64_t blo, int64_t bhi) {
    for (int64_t b = blo; b < bhi; ++b) {
      const int64_t lo = b * block, hi = std::min(n, lo + block);
      int64_t j = off[b];
      for (int64_t i = lo; i < hi; ++i) {
        if (!keep[i]) continue;
        const uint8_t* r = buf + i * record_len;
        double* row = data + j * width;
        for (int e = 0; e < n_extra; ++e) {
          const int fid = extra[2 * e], col = extra[2 * e + 1];
          double v = 0.0;
          uint16_t u16v;
          switch (fid) {
            case 0:
              std::memcpy(&u16v, r + 12, 2);
              v = u16v;
              break;
            case 1:
              v = modern ? (r[14] & 0x0F) : (r[14] & 0x07);
              break;
            case 2:
              v = modern ? ((r[14] >> 4) & 0x0F) : ((r[14] >> 3) & 0x07);
              break;
            default:  // 3/4/5 = red/green/blue
              std::memcpy(&u16v, r + fm.rgb_off + 2 * (fid - 3), 2);
              v = u16v;
          }
          row[col] = v;
        }
        row[col_x] = xyz[i * 3];
        row[col_y] = xyz[i * 3 + 1];
        row[col_z] = xyz[i * 3 + 2];
        if (xyz_keep) {
          double* t = xyz_keep->data() + j * 3;
          t[0] = xyz[i * 3];
          t[1] = xyz[i * 3 + 1];
          t[2] = xyz[i * 3 + 2];
        }
        labels[j] = modern ? r[cls_off] : (r[cls_off] & 0x1F);
        ++j;
      }
    }
  });
  return off[nb];
}

extern "C" int64_t dtmgen_las_load(
    const uint8_t* buf, int64_t n, int record_len, int point_format,
    double sx, double sy, double sz, double ox, double oy, double oz,
    double max_nn_dist, int width, int col_x, int col_y, int col_z,
    const int32_t* extra, int n_extra, double* data, int64_t* labels) {
  return LasLoadCore(buf, n, record_len, point_format, sx, sy, sz, ox, oy,
                     oz, max_nn_dist, width, col_x, col_y, col_z, extra,
                     n_extra, data, labels, nullptr);
}

namespace {

// AGL directly on the DTM LATTICE: exact k-NN (in XY) among valid grid
// nodes via an expanding Chebyshev ring scan over node indices — each
// "cell" is one node at a known coordinate, so there is no CellIndex
// build and no order[] indirection (~3x the CellIndex kernel on dense
// grids). Node coordinates replicate prepare/dtm.py::build_dtm's
// `min_x + arange(edge)*cell` float64 arithmetic exactly (the Makefile's
// -ffp-contract=off keeps `double(i)*cell + gmin_x` un-fused). Same
// termination bound as dtmgen_agl_knn: a node at Chebyshev ring r from
// the clamped centre cell is >= (r-1)*cell from the query (the clamped
// centre cell contains the query's projection onto the grid box).
// Ties (two nodes at EXACTLY equal f64 distance) may select a different
// k-subset than the CellIndex/KDTree scan order — measure-zero for
// continuous coordinates, tolerance-covered in tests like every other
// AGL engine pair (tests/test_dtm.py::test_native_agl_knn_matches_kdtree).
// Writes data[q*width + col_agl] = z_q - mean_k(node z).
void AglFromLattice(const float* grid, int64_t edge, double gmin_x,
                    double gmin_y, double cell, double* data, int64_t n,
                    int width, int col_x, int col_y, int col_z,
                    int col_agl, int k) {
  const int64_t max_ring = 2 * edge + 1;
  ParallelFor(n, 5000, [&](int64_t qlo, int64_t qhi) {
    std::vector<double> best_d(k);
    std::vector<int64_t> best_i(k);
    for (int64_t q = qlo; q < qhi; ++q) {
      double* row = data + q * width;
      const double px = row[col_x], py = row[col_y];
      const int64_t ci = std::max<int64_t>(
          0, std::min<int64_t>(int64_t(std::floor((px - gmin_x) / cell)),
                               edge - 1));
      const int64_t cj = std::max<int64_t>(
          0, std::min<int64_t>(int64_t(std::floor((py - gmin_y) / cell)),
                               edge - 1));
      // 4x4 fast path: with k <= 4 and a fully-valid 4x4 node block
      // around the query's cell, the exact k-NN are INSIDE the block:
      // any outside node is >= 2*cell away while the block's 4th-nearest
      // is <= sqrt(2)*cell (the query cell's corners witness it) — a
      // strict gap far beyond f64 rounding. Holes/borders take the ring
      // scan below.
      if (k <= 4 && ci >= 1 && ci + 2 < edge && cj >= 1 && cj + 2 < edge) {
        double bd[4] = {kInf, kInf, kInf, kInf};
        double bz[4] = {0.0, 0.0, 0.0, 0.0};
        bool all_valid = true;
        for (int64_t i = ci - 1; i <= ci + 2 && all_valid; ++i) {
          const float* g = grid + i * edge + (cj - 1);
          const double xo = double(i) * cell + gmin_x - px;
          const double xo2 = xo * xo;
          for (int t = 0; t < 4; ++t) {
            const float z = g[t];
            if (z == kNoData) {
              all_valid = false;
              break;
            }
            const double yo = double(cj - 1 + t) * cell + gmin_y - py;
            const double d2 = xo2 + yo * yo;
            int w = 0;
            for (int u = 1; u < k; ++u)
              if (bd[u] > bd[w]) w = u;
            if (d2 < bd[w]) {
              bd[w] = d2;
              bz[w] = double(z);
            }
          }
        }
        if (all_valid) {
          double sum = 0.0;
          for (int t = 0; t < k; ++t) sum += bz[t];
          row[col_agl] = row[col_z] - sum / k;
          continue;
        }
      }
      int have = 0;
      double worst = kInf;
      for (int64_t ring = 0; ring <= max_ring; ++ring) {
        if (have == k && double(ring - 1) * cell > std::sqrt(worst)) break;
        for (int64_t di = -ring; di <= ring; ++di) {
          const int64_t i = ci + di;
          if (i < 0 || i >= edge) continue;
          // interior rows of the ring contribute only dj = +-ring
          const int64_t step =
              (std::llabs(di) != ring && ring > 0) ? 2 * ring : 1;
          for (int64_t dj = -ring; dj <= ring; dj += step) {
            const int64_t j = cj + dj;
            if (j < 0 || j >= edge) continue;
            const float z = grid[i * edge + j];
            if (z == kNoData) continue;
            const double ddx = double(i) * cell + gmin_x - px;
            const double ddy = double(j) * cell + gmin_y - py;
            const double d2 = ddx * ddx + ddy * ddy;
            const int64_t node = i * edge + j;
            if (have < k) {
              best_d[have] = d2;
              best_i[have] = node;
              ++have;
              if (have == k)
                worst = *std::max_element(best_d.begin(), best_d.end());
            } else if (d2 < worst) {
              int64_t w = std::max_element(best_d.begin(), best_d.end()) -
                          best_d.begin();
              best_d[w] = d2;
              best_i[w] = node;
              worst = *std::max_element(best_d.begin(), best_d.end());
            }
          }
        }
      }
      double sum = 0.0;
      for (int t = 0; t < have; ++t) sum += double(grid[best_i[t]]);
      row[col_agl] = have ? row[col_z] - sum / have : 0.0;
    }
  });
}

}  // namespace

// Fused TILE load — the whole host side of eval/predict.py's load stage
// in ONE ctypes call (VERDICT r4 item 5; reference chain:
// /root/reference/prepare_data/process_data.py:96-123 load+noise,
// /root/reference/prepare_data/dtm.py:22-160 DTM+AGL,
// /root/reference/prepare_data/pointcloud_util.py:97-192 blocking):
//
//   1. LAS decode + noise filter + compacted (n_kept, width) matrix
//      (identical to dtmgen_las_load);
//   2. DTM rasterise over the kept points — region prelude replicates
//      prepare/dtm.py::build_dtm (floor/ceil bounds +- dtm_buffer,
//      square width, edge = floor(width/cell + 0.5)) bit-for-bit;
//   3. AGL written into data[:, col_agl]: z minus the mean of the
//      agl_k nearest valid DTM nodes in XY (lattice ring scan on dense
//      grids; packed CellIndex kernel when <25% of nodes are valid;
//      zeros when the grid has no valid node, matching gen_agl);
//   4. XY window row-indexing (room2blocks grid mode,
//      return_indices=True): origins sweep [lb, ub] at `stride`
//      i-major; per-window candidate rows are emitted in STABLE-X-SORTED
//      order — exactly _XYIndex.window's searchsorted-left/right slab +
//      inclusive y test, so the caller's rng subsampling draws are
//      byte-identical to the Python chain's.
//
// Outputs: data/labels as dtmgen_las_load; dtm_grid (edge*edge f32,
// row=x, capacity cap_grid); win_counts (nwx*nwy, capacity cap_wins);
// win_rows (concatenated candidates, capacity cap_rows — when
// rows_needed > cap_rows the counts/meta are still valid and the caller
// re-calls with a larger buffer); out_meta = [n_kept, nwx, nwy,
// rows_needed, dtm_edge, agl_engine(0 lattice/1 cellindex/2 no-nodes)];
// out_geo = [dtm_min_x, dtm_min_y, dtm_width, x_lb, x_ub, y_lb, y_ub].
// Returns n_kept, or <0 on error (-1 decode args, -2 degenerate AGL
// index, -3 cap_wins too small, -4 cap_grid too small).
extern "C" int64_t dtmgen_tile_load(
    const uint8_t* buf, int64_t n, int record_len, int point_format,
    double sx, double sy, double sz, double ox, double oy, double oz,
    double max_nn_dist, int width, int col_x, int col_y, int col_z,
    const int32_t* extra, int n_extra,
    double cell_size, double seed_cell, int boundary_width, int water,
    int buildings, double dtm_buffer, int col_agl, int agl_k,
    double block_size, double stride,
    double* data, int64_t* labels,
    float* dtm_grid, int64_t cap_grid,
    int64_t* win_counts, int64_t cap_wins,
    int64_t* win_rows, int64_t cap_rows,
    int64_t* out_meta, double* out_geo) {
  for (int t = 0; t < 6; ++t) out_meta[t] = 0;
  for (int t = 0; t < 7; ++t) out_geo[t] = 0.0;
  if (col_agl < 0 || col_agl >= width || agl_k <= 0 || cell_size <= 0 ||
      block_size <= 0 || stride <= 0 || stride > block_size)
    return -1;

  const bool prof = std::getenv("DTMGEN_TILE_PROFILE") != nullptr;
  auto now = [] {
    return std::chrono::duration<double, std::milli>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
  };
  double t0 = prof ? now() : 0.0;
  auto mark = [&](const char* tag) {
    if (!prof) return;
    const double t = now();
    std::fprintf(stderr, "[tile_load] %-8s %7.1f ms\n", tag, t - t0);
    t0 = t;
  };

  std::vector<double> xyz;
  const int64_t n_kept = LasLoadCore(
      buf, n, record_len, point_format, sx, sy, sz, ox, oy, oz,
      max_nn_dist, width, col_x, col_y, col_z, extra, n_extra, data,
      labels, &xyz);
  mark("decode");
  if (n_kept <= 0) return n_kept;
  out_meta[0] = n_kept;

  // --- DTM region prelude (build_dtm, prepare/dtm.py:440-448) ---
  double pmin_x = xyz[0], pmax_x = xyz[0], pmin_y = xyz[1], pmax_y = xyz[1];
  for (int64_t i = 1; i < n_kept; ++i) {
    pmin_x = std::min(pmin_x, xyz[i * 3]);
    pmax_x = std::max(pmax_x, xyz[i * 3]);
    pmin_y = std::min(pmin_y, xyz[i * 3 + 1]);
    pmax_y = std::max(pmax_y, xyz[i * 3 + 1]);
  }
  const double dmin_x = std::floor(pmin_x) - dtm_buffer;
  const double dmax_x = std::ceil(pmax_x) + dtm_buffer;
  const double dmin_y = std::floor(pmin_y) - dtm_buffer;
  const double dmax_y = std::ceil(pmax_y) + dtm_buffer;
  const double dwidth = std::max(dmax_x - dmin_x, dmax_y - dmin_y);
  const int64_t edge = int64_t(std::floor(dwidth / cell_size + 0.5));
  if (edge <= 0 || edge * edge > cap_grid) return -4;
  out_meta[4] = edge;
  out_geo[0] = dmin_x;
  out_geo[1] = dmin_y;
  out_geo[2] = dwidth;
  for (int64_t c = 0; c < edge * edge; ++c) dtm_grid[c] = kNoData;
  ComputeDtm(xyz.data(), n_kept, dmin_x, dmin_y, cell_size, int(edge),
             seed_cell, boundary_width, water != 0, buildings != 0,
             dtm_grid);
  mark("dtm");

  // --- AGL into data[:, col_agl] ---
  int64_t n_valid = 0;
  for (int64_t c = 0; c < edge * edge; ++c)
    n_valid += (dtm_grid[c] != kNoData);
  if (n_valid == 0) {
    // gen_agl contract: no ground nodes -> AGL is 0, not z
    for (int64_t i = 0; i < n_kept; ++i) data[i * width + col_agl] = 0.0;
    out_meta[5] = 2;
  } else if (n_valid * 4 >= edge * edge) {
    AglFromLattice(dtm_grid, edge, dmin_x, dmin_y, cell_size, data,
                   n_kept, width, col_x, col_y, col_z, col_agl,
                   int(std::min<int64_t>(agl_k, n_valid)));
    out_meta[5] = 0;
  } else {
    // holey grid: pack the valid nodes and reuse the CellIndex kernel
    // (its cell size adapts to the packed node count)
    std::vector<double> nxy(size_t(n_valid) * 2);
    std::vector<double> nz(static_cast<size_t>(n_valid));
    int64_t m = 0;
    for (int64_t i = 0; i < edge; ++i)
      for (int64_t j = 0; j < edge; ++j) {
        const float z = dtm_grid[i * edge + j];
        if (z == kNoData) continue;
        nxy[m * 2] = double(i) * cell_size + dmin_x;
        nxy[m * 2 + 1] = double(j) * cell_size + dmin_y;
        nz[m] = double(z);
        ++m;
      }
    std::vector<double> qxy(size_t(n_kept) * 2);
    std::vector<double> mean(static_cast<size_t>(n_kept));
    for (int64_t i = 0; i < n_kept; ++i) {
      qxy[i * 2] = data[i * width + col_x];
      qxy[i * 2 + 1] = data[i * width + col_y];
    }
    if (dtmgen_agl_knn(nxy.data(), nz.data(), n_valid, qxy.data(), n_kept,
                       int(std::min<int64_t>(agl_k, n_valid)),
                       mean.data()))
      return -2;
    for (int64_t i = 0; i < n_kept; ++i)
      data[i * width + col_agl] = data[i * width + col_z] - mean[i];
    out_meta[5] = 1;
  }

  mark("agl");

  // --- XY window row-indexing (room2blocks grid mode) ---
  double x_lb = kInf, x_ub = -kInf, y_lb = kInf, y_ub = -kInf;
  for (int64_t i = 0; i < n_kept; ++i) {
    const double x = data[i * width + col_x], y = data[i * width + col_y];
    x_lb = std::min(x_lb, x);
    x_ub = std::max(x_ub, x);
    y_lb = std::min(y_lb, y);
    y_ub = std::max(y_ub, y);
  }
  out_geo[3] = x_lb;
  out_geo[4] = x_ub;
  out_geo[5] = y_lb;
  out_geo[6] = y_ub;
  const int64_t nwx = std::max<int64_t>(
      int64_t(std::ceil(((x_ub - x_lb) - block_size) / stride)) + 1, 1);
  const int64_t nwy = std::max<int64_t>(
      int64_t(std::ceil(((y_ub - y_lb) - block_size) / stride)) + 1, 1);
  out_meta[1] = nwx;
  out_meta[2] = nwy;
  const int64_t n_wins = nwx * nwy;
  if (n_wins > cap_wins) return -3;

  std::vector<double> keys(static_cast<size_t>(n_kept));
  for (int64_t i = 0; i < n_kept; ++i) keys[i] = data[i * width + col_x];
  std::vector<int64_t> order(static_cast<size_t>(n_kept));
  dtmgen_argsort_f64(keys.data(), n_kept, order.data());
  mark("argsort");
  std::vector<double> xs(static_cast<size_t>(n_kept));
  std::vector<double> ys(static_cast<size_t>(n_kept));
  for (int64_t s = 0; s < n_kept; ++s) {
    xs[s] = keys[order[s]];
    ys[s] = data[order[s] * width + col_y];
  }

  std::vector<int64_t> w_lo(static_cast<size_t>(n_wins));
  std::vector<int64_t> w_hi(static_cast<size_t>(n_wins));
  ParallelFor(n_wins, 1, [&](int64_t wlo, int64_t whi) {
    for (int64_t w = wlo; w < whi; ++w) {
      const int64_t i = w / nwy, j = w % nwy;  // i-major origin order
      const double x0 = x_lb + double(i) * stride;
      const double y0 = y_lb + double(j) * stride;
      const double x1 = x0 + block_size, y1 = y0 + block_size;
      const int64_t lo =
          std::lower_bound(xs.begin(), xs.end(), x0) - xs.begin();
      const int64_t hi =
          std::upper_bound(xs.begin(), xs.end(), x1) - xs.begin();
      w_lo[w] = lo;
      w_hi[w] = hi;
      int64_t cnt = 0;
      for (int64_t s = lo; s < hi; ++s)
        cnt += (ys[s] >= y0 && ys[s] <= y1);
      win_counts[w] = cnt;
    }
  });
  std::vector<int64_t> w_off(size_t(n_wins) + 1, 0);
  for (int64_t w = 0; w < n_wins; ++w)
    w_off[w + 1] = w_off[w] + win_counts[w];
  out_meta[3] = w_off[n_wins];
  if (w_off[n_wins] <= cap_rows) {
    ParallelFor(n_wins, 1, [&](int64_t wlo, int64_t whi) {
      for (int64_t w = wlo; w < whi; ++w) {
        const int64_t j = w % nwy;
        const double y0 = y_lb + double(j) * stride;
        const double y1 = y0 + block_size;
        int64_t t = w_off[w];
        for (int64_t s = w_lo[w]; s < w_hi[w]; ++s)
          if (ys[s] >= y0 && ys[s] <= y1) win_rows[t++] = order[s];
      }
    });
  }
  mark("windows");
  return n_kept;
}

#ifndef DTMGEN_NO_MAIN
int main(int argc, char** argv) {
  if (argc < 10) {
    std::fprintf(stderr,
                 "usage: dtmgen <points.txt> <outdir> <region.txt> "
                 "<cell> <seed_cell> <boundary_width> <water> <buildings> "
                 "<tin_ply>\n");
    return 2;
  }
  const std::string pts_path = argv[1];
  const std::string outdir = argv[2];
  const std::string region_path = argv[3];
  const double cell = std::atof(argv[4]);
  const double seed_cell = std::atof(argv[5]);
  const int boundary_width = std::atoi(argv[6]);
  const bool water = std::strcmp(argv[7], "true") == 0;
  const bool buildings = std::strcmp(argv[8], "true") == 0;
  const bool tin = std::strcmp(argv[9], "true") == 0;

  double min_x, min_y, max_x, max_y;
  {
    std::ifstream rf(region_path);
    if (!(rf >> min_x >> min_y >> max_x >> max_y)) {
      std::fprintf(stderr, "dtmgen: cannot parse region %s\n",
                   region_path.c_str());
      return 2;
    }
  }
  const double width = std::max(max_x - min_x, max_y - min_y);
  const int edge = int(std::floor(width / cell + 0.5));
  if (edge <= 0) {
    std::fprintf(stderr, "dtmgen: empty region\n");
    return 2;
  }

  std::vector<double> pts;  // x y z triplets
  {
    std::ifstream pf(pts_path);
    if (!pf) {
      std::fprintf(stderr, "dtmgen: cannot open %s\n", pts_path.c_str());
      return 2;
    }
    std::string line;
    while (std::getline(pf, line)) {
      if (line.empty()) continue;
      const char* s = line.c_str();
      char* end = nullptr;
      double x = std::strtod(s, &end);
      if (end == s) continue;
      s = end;
      double y = std::strtod(s, &end);
      if (end == s) continue;
      s = end;
      double z = std::strtod(s, &end);
      if (end == s) continue;
      pts.push_back(x);
      pts.push_back(y);
      pts.push_back(z);
    }
  }

  std::vector<float> out(size_t(edge) * edge, kNoData);
  ComputeDtm(pts.data(), int64_t(pts.size() / 3), min_x, min_y, cell, edge,
             seed_cell, boundary_width, water, buildings, out.data());

  // write .dat: file[col*edge + row] = H[row, col]
  {
    char name[128];
    std::snprintf(name, sizeof name, "dtm_%d_%d.dat", int(min_x), int(min_y));
    std::string path = outdir + "/" + name;
    std::ofstream of(path, std::ios::binary);
    std::vector<float> transposed(out.size());
    for (int r = 0; r < edge; ++r)
      for (int c = 0; c < edge; ++c)
        transposed[size_t(c) * edge + r] = out[size_t(r) * edge + c];
    of.write(reinterpret_cast<const char*>(transposed.data()),
             std::streamsize(transposed.size() * sizeof(float)));
  }

  if (tin) {
    // simple grid-mesh PLY over valid cells
    char name[128];
    std::snprintf(name, sizeof name, "tin_%d_%d.ply", int(min_x), int(min_y));
    std::string path = outdir + "/" + name;
    std::vector<int32_t> vid(size_t(edge) * edge, -1);
    std::ostringstream verts, faces;
    int nv = 0, nf = 0;
    for (int r = 0; r < edge; ++r)
      for (int c = 0; c < edge; ++c)
        if (out[size_t(r) * edge + c] != kNoData) {
          vid[size_t(r) * edge + c] = nv++;
          verts << (min_x + r * cell) << " " << (min_y + c * cell) << " "
                << out[size_t(r) * edge + c] << "\n";
        }
    for (int r = 0; r + 1 < edge; ++r)
      for (int c = 0; c + 1 < edge; ++c) {
        int a = vid[size_t(r) * edge + c], b = vid[size_t(r) * edge + c + 1];
        int d = vid[size_t(r + 1) * edge + c],
            e = vid[size_t(r + 1) * edge + c + 1];
        if (a >= 0 && b >= 0 && d >= 0) {
          faces << "3 " << a << " " << b << " " << d << "\n";
          ++nf;
        }
        if (b >= 0 && e >= 0 && d >= 0) {
          faces << "3 " << b << " " << e << " " << d << "\n";
          ++nf;
        }
      }
    std::ofstream of(path);
    of << "ply\nformat ascii 1.0\nelement vertex " << nv
       << "\nproperty double x\nproperty double y\nproperty double z\n"
          "element face "
       << nf << "\nproperty list uchar int vertex_indices\nend_header\n"
       << verts.str() << faces.str();
  }
  return 0;
}
#endif  // DTMGEN_NO_MAIN
