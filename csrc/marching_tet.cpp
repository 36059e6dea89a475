// Marching-tetrahedra isosurface extraction — native fast path.
//
// Same algorithm as color_neus_tpu/ops/marching_cubes.py (6-tet cube
// decomposition sharing the 0-6 body diagonal, 16-case table, global
// edge-keyed vertex dedup): the Python module is the oracle, this is the
// production path for 512^3 grids (replaces the reference's PyMCubes C++
// dependency, NeuS.py:5,35).
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp marching_tet.cpp -o libmarchingtet.so
// ABI: plain C, driven via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

const int CORNERS[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

const int TETS[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

const int TET_EDGES[6][2] = {{0, 1}, {0, 2}, {0, 3}, {1, 2}, {1, 3}, {2, 3}};

// TRI_TABLE[mask][tri][corner] = tet-edge id, -1 padded. Built at init
// from the same base cases as the Python module (complement = reversed).
int TRI_TABLE[16][2][3];

void set_case(int mask, const int tris[][3], int ntris) {
  for (int m = 0; m < 16; m++) { /* no-op, table zeroed by init */ }
  for (int t = 0; t < ntris; t++)
    for (int k = 0; k < 3; k++) TRI_TABLE[mask][t][k] = tris[t][k];
  int comp = 15 ^ mask;
  for (int t = 0; t < ntris; t++)
    for (int k = 0; k < 3; k++) TRI_TABLE[comp][t][k] = tris[t][2 - k];
}

struct TableInit {
  TableInit() {
    for (int m = 0; m < 16; m++)
      for (int t = 0; t < 2; t++)
        for (int k = 0; k < 3; k++) TRI_TABLE[m][t][k] = -1;
    const int c1[][3] = {{0, 1, 2}};
    set_case(0b0001, c1, 1);
    const int c2[][3] = {{0, 4, 3}};
    set_case(0b0010, c2, 1);
    const int c4[][3] = {{1, 3, 5}};
    set_case(0b0100, c4, 1);
    const int c8[][3] = {{2, 5, 4}};
    set_case(0b1000, c8, 1);
    const int c3[][3] = {{1, 2, 4}, {1, 4, 3}};
    set_case(0b0011, c3, 2);
    const int c5[][3] = {{0, 3, 5}, {0, 5, 2}};
    set_case(0b0101, c5, 2);
    const int c9[][3] = {{0, 4, 5}, {0, 5, 1}};
    set_case(0b1001, c9, 2);
  }
} table_init;

}  // namespace

extern "C" {

// Extract isosurface of u[rx][ry][rz] (C-order) at `level`; "inside" is
// u > level. Returns 0 on success. Caller frees *out_verts / *out_tris
// with mt_free. Vertices are in grid-index coordinates OFFSET by
// (ox, oy, oz): interpolation runs at absolute lattice coordinates, so
// a sub-block march is bitwise identical to the same cubes of a
// full-grid march (float addition of the offset AFTER interpolation is
// not associative; block-welded extraction needs exactness).
int mt_extract(const float* u, int64_t rx, int64_t ry, int64_t rz,
               float level, int64_t ox, int64_t oy, int64_t oz,
               float** out_verts, int64_t* n_verts,
               int64_t** out_tris, int64_t* n_tris) {
  auto flat = [&](int64_t x, int64_t y, int64_t z) -> uint64_t {
    return (uint64_t)((x * ry + y) * rz + z);
  };
  auto val = [&](int64_t x, int64_t y, int64_t z) -> float {
    return u[(x * ry + y) * rz + z];
  };

  // edge key -> vertex index
  std::unordered_map<uint64_t, int64_t> edge_map;
  edge_map.reserve(1 << 16);
  std::vector<float> verts;
  std::vector<int64_t> tris;

  int64_t cv[8];   // corner flat-ish coords packed as x,y,z triplets
  float cval[8];
  int64_t cx[8], cy[8], cz[8];

  for (int64_t z0 = 0; z0 + 1 < rz; z0++) {
    for (int64_t x0 = 0; x0 + 1 < rx; x0++) {
      for (int64_t y0 = 0; y0 + 1 < ry; y0++) {
        // occupancy prefilter
        float cmin = 1e30f, cmax = -1e30f;
        for (int c = 0; c < 8; c++) {
          cx[c] = x0 + CORNERS[c][0];
          cy[c] = y0 + CORNERS[c][1];
          cz[c] = z0 + CORNERS[c][2];
          cval[c] = val(cx[c], cy[c], cz[c]);
          if (cval[c] < cmin) cmin = cval[c];
          if (cval[c] > cmax) cmax = cval[c];
        }
        if (!(cmin <= level && cmax > level)) continue;

        for (int t = 0; t < 6; t++) {
          int mask = 0;
          for (int c = 0; c < 4; c++)
            if (cval[TETS[t][c]] > level) mask |= 1 << c;
          for (int tri = 0; tri < 2; tri++) {
            if (TRI_TABLE[mask][tri][0] < 0) continue;
            int64_t idx[3];
            bool degenerate = false;
            for (int k = 0; k < 3; k++) {
              int e = TRI_TABLE[mask][tri][k];
              int a = TETS[t][TET_EDGES[e][0]];
              int b = TETS[t][TET_EDGES[e][1]];
              uint64_t fa = flat(cx[a], cy[a], cz[a]);
              uint64_t fb = flat(cx[b], cy[b], cz[b]);
              // canonical edge orientation (lo -> hi): t's rounding must
              // not depend on which tet reached the edge first, or
              // block-decomposed marches of the same grid disagree in
              // the last ulp and fail to weld
              if (fa > fb) {
                int tswap = a; a = b; b = tswap;
                uint64_t fswap = fa; fa = fb; fb = fswap;
              }
              uint64_t lo = fa;
              uint64_t hi = fb;
              uint64_t key = (lo << 32) | hi;
              auto it = edge_map.find(key);
              int64_t vid;
              if (it != edge_map.end()) {
                vid = it->second;
              } else {
                float va = cval[a], vb = cval[b];
                float denom = vb - va;
                if (denom > -1e-12f && denom < 1e-12f)
                  denom = 1e-12f;
                float tt = (level - va) / denom;
                if (tt < 0.f) tt = 0.f;
                if (tt > 1.f) tt = 1.f;
                vid = (int64_t)(verts.size() / 3);
                verts.push_back((float)(cx[a] + ox) + tt * ((float)cx[b] - (float)cx[a]));
                verts.push_back((float)(cy[a] + oy) + tt * ((float)cy[b] - (float)cy[a]));
                verts.push_back((float)(cz[a] + oz) + tt * ((float)cz[b] - (float)cz[a]));
                edge_map.emplace(key, vid);
              }
              idx[k] = vid;
            }
            if (idx[0] == idx[1] || idx[1] == idx[2] || idx[0] == idx[2])
              degenerate = true;
            if (!degenerate) {
              tris.push_back(idx[0]);
              tris.push_back(idx[1]);
              tris.push_back(idx[2]);
            }
          }
        }
      }
    }
  }

  *n_verts = (int64_t)(verts.size() / 3);
  *n_tris = (int64_t)(tris.size() / 3);
  *out_verts = (float*)std::malloc(verts.size() * sizeof(float));
  *out_tris = (int64_t*)std::malloc(tris.size() * sizeof(int64_t));
  if ((verts.size() && !*out_verts) || (tris.size() && !*out_tris)) return 1;
  if (verts.size()) std::memcpy(*out_verts, verts.data(), verts.size() * sizeof(float));
  if (tris.size()) std::memcpy(*out_tris, tris.data(), tris.size() * sizeof(int64_t));
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
