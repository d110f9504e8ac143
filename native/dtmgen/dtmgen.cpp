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
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
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
  // interior no-data holes -> min of adjacent valid heights, sweeping inward.
  // Double-buffered (Jacobi): each iteration reads only the previous
  // iteration's grid, matching the numpy twin (_fill_water_holes in
  // dgcnn_tpu/prepare/dtm.py) — an in-place sweep would propagate values
  // right/down within one pass and fill asymmetric multi-cell holes with
  // different heights.
  std::vector<float> prev(*out);
  for (int it = 0; it < edge; ++it) {
    bool changed = false;
    for (int r = 0; r < edge; ++r)
      for (int c = 0; c < edge; ++c) {
        size_t i = size_t(r) * edge + c;
        if (prev[i] != kNoData) continue;
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
