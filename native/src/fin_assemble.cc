// Native host-side assembly of the thermal-fin stencil operator.
//
// The reference delegates meshing + sparse assembly to FEniCS/DOLFIN (C++);
// this is the rebuild's native equivalent (SURVEY.md §2b): it generates the
// structured fin triangulation and assembles the affine 7-diagonal stencil
// operator (per-region stiffness planes, exterior boundary mass, identity
// padding, root load, QoI rows) directly into caller-provided buffers.
//
// Mirrors bayesianinferencedl_tpu/fem/dia.py:assemble_fin_dia bit-for-bit in
// exact arithmetic; tests/test_native.py pins the two against each other.
//
// Geometry (SURVEY.md Appendix B): post x in [-0.5, 0.5], y in [0, 4];
// 4 subfin pairs of thickness 0.25 at y in [0.75+i, 1+i], reaching x = ±3.
// Grid: cell size h = 0.25/res, nx = 24*res, ny = 16*res cells.
// Node id: gid = ix * (ny+1) + iy. Diagonal offsets (ascending):
//   [-(ny+2), -(ny+1), -1, 0, 1, ny+1, ny+2]

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int N_REGIONS = 5;
constexpr int N_DIAG = 7;

// conductivity region of a point (cell centroid); -1 = outside the fin
int region_of(double x, double y) {
  for (int i = 0; i < 4; ++i) {
    double lo = 0.75 + i, hi = 1.0 + i;
    if (y >= lo && y <= hi && std::fabs(x) > 0.5 && std::fabs(x) <= 3.0) return i;
  }
  if (std::fabs(x) <= 0.5 && y >= 0.0 && y <= 4.0) return 4;
  return -1;
}

struct Ctx {
  int res, nx, ny, n_grid, n_padded;
  double h;
};

Ctx make_ctx(int res, int n_padded) {
  Ctx c;
  c.res = res;
  c.nx = 24 * res;
  c.ny = 16 * res;
  c.h = 0.25 / res;
  c.n_grid = (c.nx + 1) * (c.ny + 1);
  c.n_padded = n_padded;
  return c;
}

inline int slot_of(int off, int ny) {
  // ascending offsets: -(ny+2), -(ny+1), -1, 0, 1, ny+1, ny+2
  if (off == -(ny + 2)) return 0;
  if (off == -(ny + 1)) return 1;
  if (off == -1) return 2;
  if (off == 0) return 3;
  if (off == 1) return 4;
  if (off == ny + 1) return 5;
  if (off == ny + 2) return 6;
  return -1;
}

// P1 stiffness of triangle (p0, p1, p2), unit conductivity.
void tri_stiffness(const double* px, const double* py, double K[3][3], double* area_out) {
  double b[3] = {py[1] - py[2], py[2] - py[0], py[0] - py[1]};
  double c[3] = {px[2] - px[1], px[0] - px[2], px[1] - px[0]};
  double area = 0.5 * ((px[1] - px[0]) * (py[2] - py[0]) - (py[1] - py[0]) * (px[2] - px[0]));
  for (int a = 0; a < 3; ++a)
    for (int d = 0; d < 3; ++d) K[a][d] = (b[a] * b[d] + c[a] * c[d]) / (4.0 * area);
  *area_out = area;
}

}  // namespace

extern "C" {

// Grid node count for a resolution (before lane padding).
int fin_grid_nodes(int res) {
  return (24 * res + 1) * (16 * res + 1);
}

// Assemble the full stencil operator. All output buffers are zeroed here.
//   comp_vals: n_padded * 7 * 5   (row-major [node][slot][region])
//   ext_mass:  n_padded * 7
//   fixed_id:  n_padded * 7
//   F_root:    n_padded
//   qoi:       5 * n_padded       (row-major [region][node])
//   qoi_root:  n_padded
// Returns 0 on success, negative on error.
int fin_assemble_dia(int res, int n_padded, double* comp_vals, double* ext_mass,
                     double* fixed_id, double* F_root, double* qoi, double* qoi_root) {
  if (res < 1) return -1;
  Ctx c = make_ctx(res, n_padded);
  if (n_padded < c.n_grid) return -2;
  const int ny = c.ny;
  const double h = c.h;

  std::memset(comp_vals, 0, sizeof(double) * (size_t)n_padded * N_DIAG * N_REGIONS);
  std::memset(ext_mass, 0, sizeof(double) * (size_t)n_padded * N_DIAG);
  std::memset(fixed_id, 0, sizeof(double) * (size_t)n_padded * N_DIAG);
  std::memset(F_root, 0, sizeof(double) * (size_t)n_padded);
  std::memset(qoi, 0, sizeof(double) * (size_t)N_REGIONS * n_padded);
  std::memset(qoi_root, 0, sizeof(double) * (size_t)n_padded);

  double region_area[N_REGIONS] = {0, 0, 0, 0, 0};

  auto gid = [&](int ix, int iy) { return ix * (ny + 1) + iy; };
  auto add_stiff = [&](int row, int col, int region, double v) {
    int s = slot_of(col - row, ny);
    comp_vals[((size_t)row * N_DIAG + s) * N_REGIONS + region] += v;
  };

  // --- element loop over kept cells (two CCW triangles per cell) ----------
  for (int ix = 0; ix < c.nx; ++ix) {
    for (int iy = 0; iy < c.ny; ++iy) {
      double cx = -3.0 + (ix + 0.5) * h;
      double cy = (iy + 0.5) * h;
      int reg = region_of(cx, cy);
      if (reg < 0) continue;

      int v00 = gid(ix, iy), v10 = gid(ix + 1, iy);
      int v01 = gid(ix, iy + 1), v11 = gid(ix + 1, iy + 1);
      double x0 = -3.0 + ix * h, x1 = x0 + h;
      double y0 = iy * h, y1 = y0 + h;

      // triangles (v00, v10, v11) and (v00, v11, v01)
      const int tris[2][3] = {{v00, v10, v11}, {v00, v11, v01}};
      const double txs[2][3] = {{x0, x1, x1}, {x0, x1, x0}};
      const double tys[2][3] = {{y0, y0, y1}, {y0, y1, y1}};
      for (int t = 0; t < 2; ++t) {
        double K[3][3], area;
        tri_stiffness(txs[t], tys[t], K, &area);
        for (int a = 0; a < 3; ++a)
          for (int d = 0; d < 3; ++d) add_stiff(tris[t][a], tris[t][d], reg, K[a][d]);
        region_area[reg] += area;
        for (int a = 0; a < 3; ++a)
          qoi[(size_t)reg * n_padded + tris[t][a]] += area / 3.0;
      }
    }
  }

  // --- boundary edges: cell sides whose neighbor cell is outside ----------
  // For each kept cell, check its 4 sides; a side is boundary if the
  // adjacent cell (across that side) is outside the fin.
  auto cell_inside = [&](int ix, int iy) {
    if (ix < 0 || iy < 0 || ix >= c.nx || iy >= c.ny) return false;
    double cx = -3.0 + (ix + 0.5) * h;
    double cy = (iy + 0.5) * h;
    return region_of(cx, cy) >= 0;
  };
  auto add_edge = [&](int a, int b, bool is_root) {
    // P1 edge mass L/6 [[2,1],[1,2]] for Robin (ext) edges, load L/2 [1,1]
    // and boundary-average weights for root edges
    double L = h;
    if (is_root) {
      F_root[a] += 0.5 * L;
      F_root[b] += 0.5 * L;
      qoi_root[a] += 0.5 * L;
      qoi_root[b] += 0.5 * L;
    } else {
      double m = L / 6.0;
      ext_mass[(size_t)a * N_DIAG + slot_of(0, ny)] += 2.0 * m;
      ext_mass[(size_t)b * N_DIAG + slot_of(0, ny)] += 2.0 * m;
      ext_mass[(size_t)a * N_DIAG + slot_of(b - a, ny)] += m;
      ext_mass[(size_t)b * N_DIAG + slot_of(a - b, ny)] += m;
    }
  };

  for (int ix = 0; ix < c.nx; ++ix) {
    for (int iy = 0; iy < c.ny; ++iy) {
      if (!cell_inside(ix, iy)) continue;
      double mx = -3.0 + (ix + 0.5) * h;  // cell center x
      // bottom side (iy-1 neighbor): root if y==0 and |x|<=0.5
      if (!cell_inside(ix, iy - 1)) {
        bool root = (iy == 0) && (std::fabs(mx) < 0.5);
        add_edge(gid(ix, iy), gid(ix + 1, iy), root);
      }
      if (!cell_inside(ix, iy + 1)) add_edge(gid(ix, iy + 1), gid(ix + 1, iy + 1), false);
      if (!cell_inside(ix - 1, iy)) add_edge(gid(ix, iy), gid(ix, iy + 1), false);
      if (!cell_inside(ix + 1, iy)) add_edge(gid(ix + 1, iy), gid(ix + 1, iy + 1), false);
    }
  }

  // --- identity rows for nodes with no stiffness diagonal + padding -------
  for (int i = 0; i < n_padded; ++i) {
    double diag = 0.0;
    for (int r = 0; r < N_REGIONS; ++r)
      diag += comp_vals[((size_t)i * N_DIAG + 3) * N_REGIONS + r];
    if (diag == 0.0) fixed_id[(size_t)i * N_DIAG + 3] = 1.0;
  }

  // --- normalize QoI rows --------------------------------------------------
  for (int r = 0; r < N_REGIONS; ++r) {
    double s = 0.0;
    for (int i = 0; i < n_padded; ++i) s += qoi[(size_t)r * n_padded + i];
    if (s > 0)
      for (int i = 0; i < n_padded; ++i) qoi[(size_t)r * n_padded + i] /= s;
  }
  double sr = 0.0;
  for (int i = 0; i < n_padded; ++i) sr += qoi_root[i];
  if (sr > 0)
    for (int i = 0; i < n_padded; ++i) qoi_root[i] /= sr;

  return 0;
}

}  // extern "C"
