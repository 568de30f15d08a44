// Native host-side kernels for the sassd_tpu data pipeline.
//
// TPU-native equivalents of the reference's host/native ops:
//   * voxelize        — points -> dense-padded voxels, first-come semantics
//                       (replaces the numba kernel mmdet/ops/points_op/
//                        points_ops.py:5-50 that runs in dataloader workers)
//   * points_in_rbbox — point-in-rotated-box flags (replaces
//                       mmdet/ops/points_op/src/points_op.cpp:92-144)
//   * rotated_overlap — pairwise rotated-rectangle intersection areas via
//                       Sutherland-Hodgman clipping (host evaluator kernel;
//                       replaces the numba-CUDA stack in
//                       mmdet/core/post_processing/rotate_nms_gpu.py)
//
// All rotations use the clockwise-positive yaw convention (KITTI lidar).
// Exposed via a plain C ABI for ctypes; built by csrc/Makefile.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// points:  [n, f] float32, xyz in the first 3 columns
// out_voxels: [max_voxels, max_pts, f]  (must be zeroed by caller)
// out_coords: [max_voxels, 3] int32 (zyx)
// out_num:    [max_voxels] int32
// returns the number of voxels produced (<= max_voxels)
int64_t voxelize(const float* points, int64_t n, int64_t f,
                 const float* pc_min, const float* voxel_size,
                 const int64_t* grid,  // [3] xyz
                 int64_t max_pts, int64_t max_voxels,
                 float* out_voxels, int32_t* out_coords, int32_t* out_num) {
  std::unordered_map<int64_t, int32_t> table;
  table.reserve(static_cast<size_t>(max_voxels) * 2);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float* p = points + i * f;
    int64_t c[3];
    bool ok = true;
    for (int d = 0; d < 3; ++d) {
      c[d] = static_cast<int64_t>(
          std::floor((p[d] - pc_min[d]) / voxel_size[d]));
      if (c[d] < 0 || c[d] >= grid[d]) { ok = false; break; }
    }
    if (!ok) continue;
    const int64_t key = (c[2] * grid[1] + c[1]) * grid[0] + c[0];  // zyx
    auto it = table.find(key);
    int32_t vid;
    if (it == table.end()) {
      if (m >= max_voxels) continue;
      vid = static_cast<int32_t>(m++);
      table.emplace(key, vid);
      out_coords[vid * 3 + 0] = static_cast<int32_t>(c[2]);
      out_coords[vid * 3 + 1] = static_cast<int32_t>(c[1]);
      out_coords[vid * 3 + 2] = static_cast<int32_t>(c[0]);
      out_num[vid] = 0;
    } else {
      vid = it->second;
    }
    if (out_num[vid] < max_pts) {
      std::memcpy(out_voxels + (static_cast<int64_t>(vid) * max_pts +
                                out_num[vid]) * f,
                  p, sizeof(float) * f);
      out_num[vid] += 1;
    }
  }
  return m;
}

// points [n,3+] vs boxes [m,7] (x,y,z_bottom,w,l,h,yaw) -> flags [n,m] uint8
void points_in_rbbox(const float* points, int64_t n, int64_t stride,
                     const float* boxes, int64_t m, uint8_t* out) {
  for (int64_t j = 0; j < m; ++j) {
    const float* b = boxes + j * 7;
    const float c = std::cos(b[6]), s = std::sin(b[6]);
    const float hw = b[3] * 0.5f, hl = b[4] * 0.5f;
    const float z0 = b[2], z1 = b[2] + b[5];
    for (int64_t i = 0; i < n; ++i) {
      const float* p = points + i * stride;
      const float dx = p[0] - b[0], dy = p[1] - b[1];
      const float lx = dx * c - dy * s;
      const float ly = dx * s + dy * c;
      out[i * m + j] =
          (std::fabs(lx) <= hw) && (std::fabs(ly) <= hl) &&
          (p[2] >= z0) && (p[2] <= z1);
    }
  }
}

// BEV-occupancy anchors mask (kitti.py:227-238 + geometry.py:675-710):
// occupancy integral image over the voxel grid, queried per anchor footprint.
// coords: [v, 3] int32 zyx (-1 rows = padding); anchors_bv: [a, 4] float32
// (xmin, ymin, xmax, ymax); grid: [3] int64 xyz; out: [a] uint8.
void anchors_mask(const int32_t* coords, int64_t v, const float* anchors_bv,
                  int64_t a, const float* voxel_size, const float* pc_min,
                  const int64_t* grid, float threshold, uint8_t* out) {
  const int64_t W = grid[0], H = grid[1];
  // integral image with a zero row/col border: I[(y+1)*(W+1) + (x+1)]
  std::vector<int32_t> integral(static_cast<size_t>((H + 1) * (W + 1)), 0);
  for (int64_t i = 0; i < v; ++i) {
    const int32_t z = coords[i * 3];
    if (z < 0) continue;
    const int64_t y = coords[i * 3 + 1], x = coords[i * 3 + 2];
    integral[(y + 1) * (W + 1) + (x + 1)] += 1;
  }
  for (int64_t y = 1; y <= H; ++y) {
    int32_t run = 0;
    int32_t* row = integral.data() + y * (W + 1);
    const int32_t* prev = integral.data() + (y - 1) * (W + 1);
    for (int64_t x = 1; x <= W; ++x) {
      run += row[x];
      row[x] = run + prev[x];
    }
  }
  auto clampi = [](int64_t v_, int64_t lo, int64_t hi) {
    return v_ < lo ? lo : (v_ > hi ? hi : v_);
  };
  for (int64_t i = 0; i < a; ++i) {
    const float* bv = anchors_bv + i * 4;
    const int64_t x0 = clampi(static_cast<int64_t>(
        std::floor((bv[0] - pc_min[0]) / voxel_size[0])), 0, W - 1);
    const int64_t y0 = clampi(static_cast<int64_t>(
        std::floor((bv[1] - pc_min[1]) / voxel_size[1])), 0, H - 1);
    const int64_t x1 = clampi(static_cast<int64_t>(
        std::floor((bv[2] - pc_min[0]) / voxel_size[0])), 0, W - 1);
    const int64_t y1 = clampi(static_cast<int64_t>(
        std::floor((bv[3] - pc_min[1]) / voxel_size[1])), 0, H - 1);
    // reference semantics (fused_get_anchors_area): ID - IB - IC + IA with
    // corner INDICES (not +1 spans): area over [y0+1..y1] x [x0+1..x1]
    const int64_t area =
        integral[(y1 + 1) * (W + 1) + (x1 + 1)]
        - integral[(y1 + 1) * (W + 1) + (x0 + 1)]
        - integral[(y0 + 1) * (W + 1) + (x1 + 1)]
        + integral[(y0 + 1) * (W + 1) + (x0 + 1)];
    out[i] = area > threshold;
  }
}

namespace {

struct Pt { double x, y; };

inline double cross_d(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// corners of a (cx, cy, w, l, yaw) box, clockwise yaw, CCW winding
inline void box_corners(const double* b, Pt* c) {
  const double co = std::cos(b[4]), si = std::sin(b[4]);
  const double sx[4] = {0.5, -0.5, -0.5, 0.5};
  const double sy[4] = {0.5, 0.5, -0.5, -0.5};
  for (int i = 0; i < 4; ++i) {
    const double lx = sx[i] * b[2], ly = sy[i] * b[3];
    c[i].x = lx * co + ly * si + b[0];
    c[i].y = -lx * si + ly * co + b[1];
  }
}

double intersection_area(const double* ba, const double* bb) {
  Pt subj[8], clip[4], out[8];
  int n = 4;
  box_corners(ba, subj);
  box_corners(bb, clip);
  for (int e = 0; e < 4 && n > 0; ++e) {
    const Pt p1 = clip[e], p2 = clip[(e + 1) & 3];
    int m2 = 0;
    for (int i = 0; i < n; ++i) {
      const Pt cur = subj[i];
      const Pt nxt = subj[(i + 1) % n];
      const double di = cross_d(p1, p2, cur);
      const double dj = cross_d(p1, p2, nxt);
      if (di >= 0) out[m2++] = cur;
      if ((di >= 0) != (dj >= 0)) {
        const double t = di / (di - dj);
        out[m2++] = {cur.x + t * (nxt.x - cur.x),
                     cur.y + t * (nxt.y - cur.y)};
      }
    }
    n = m2;
    for (int i = 0; i < n; ++i) subj[i] = out[i];
  }
  if (n < 3) return 0.0;
  double area = 0.0;
  for (int i = 0; i < n; ++i) {
    const Pt& a = subj[i];
    const Pt& b2 = subj[(i + 1) % n];
    area += a.x * b2.y - b2.x * a.y;
  }
  return std::fabs(area) * 0.5;
}

}  // namespace

// boxes [n,5] x qboxes [k,5] (cx, cy, w, l, yaw) -> out [n,k] float32
// criterion: -1 IoU, 0 inter/area1, 1 inter/area2, 2 raw intersection area
void rotated_overlap(const double* boxes, int64_t n, const double* qboxes,
                     int64_t k, int criterion, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const double* a = boxes + i * 5;
    const double area1 = a[2] * a[3];
    for (int64_t j = 0; j < k; ++j) {
      const double* b = qboxes + j * 5;
      const double inter = intersection_area(a, b);
      double denom;
      switch (criterion) {
        case -1: denom = area1 + b[2] * b[3] - inter; break;
        case 0: denom = area1; break;
        case 1: denom = b[2] * b[3]; break;
        default: out[i * k + j] = static_cast<float>(inter); continue;
      }
      out[i * k + j] =
          static_cast<float>(denom > 1e-9 ? inter / denom : 0.0);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// sparse conv plan builder (host rulebook)
// ---------------------------------------------------------------------------
// Builds, for the whole VxNet ladder, the gather plans the device kernels
// consume: per level L the active coords, the 27-tap submanifold neighbor
// rows, and (L>=1) the 27-tap stride-2 gather rows into level L-1. The
// reference delegates this to spconv's GPU rulebook; on TPU the host builds
// it in the data loader, pipelined with device compute, while the device
// keeps a pure-XLA fallback.
//
// Every level's active set is KEY-SORTED (required by the engine's packed
// triple gather), which makes hash maps unnecessary: for a fixed kernel-tap
// offset the probe keys are non-decreasing in row order, so each tap is a
// single two-pointer merge of two sorted streams — linear memory access,
// no probing. Downsampled active sets come from sort+unique over the <=8
// parent candidates per voxel, identical to the device's _unique_sorted
// semantics (including lowest-keys-win cap truncation).
//
// Outputs are -1-padded: coords rows -1, plan entries -1 (missing neighbor /
// padded row).

namespace {

struct Level {
  std::vector<int32_t> coords;  // [n, 3] zyx, key-sorted
  std::vector<int64_t> keys;    // [n], strictly ascending
  int64_t d, h, w;
};

inline int64_t key_of(int64_t z, int64_t y, int64_t x, const Level& L) {
  return (z * L.h + y) * L.w + x;
}

// Fill one plan row: row[i] = index of probe(i) in L.keys, or -1.
// Linear two-pointer merge while probe(i) is non-decreasing (the common
// case: subm/stride probes are monotone in key-sorted row order); a
// backward jump (e.g. aux parent keys, which are NOT monotone in level-0
// order — y resets when z increments within one parent cell) rewinds the
// cursor with a binary search.
template <class Probe>
inline void merge_tap(const Level& L, int64_t n, int64_t cap, int32_t* row,
                      Probe&& probe) {
  const int64_t m = static_cast<int64_t>(L.keys.size());
  const int64_t* keys = L.keys.data();
  int64_t j = 0;
  const int64_t lim = n < cap ? n : cap;
  for (int64_t i = 0; i < lim; ++i) {
    const int64_t q = probe(i);
    if (q < 0) { row[i] = -1; continue; }
    if (j > 0 && keys[j - 1] >= q)
      j = std::lower_bound(keys, keys + j, q) - keys;
    while (j < m && keys[j] < q) ++j;
    row[i] = (j < m && keys[j] == q) ? static_cast<int32_t>(j) : -1;
  }
}

// Grouped 3-tap merge: the x-consecutive taps (dz,dy,-1/0/+1) probe keys
// qc-1, qc, qc+1 for a shared base qc — one pass fills all three rows.
// `probe` returns the CENTER key qc (or -1 when (z,y) taps are out of
// bounds); xok0/xok2 gate the x-1 / x+1 taps (a key match with the x edge
// wrapped to the neighboring row must not count). Monotone probes advance
// a linear cursor; backward jumps rewind via binary search (see merge_tap).
template <class Probe, class XOk0, class XOk2>
inline void merge_tap3(const Level& L, int64_t n, int64_t cap, int32_t* r0,
                       int32_t* r1, int32_t* r2, Probe&& probe, XOk0&& xok0,
                       XOk2&& xok2) {
  const int64_t m = static_cast<int64_t>(L.keys.size());
  const int64_t* keys = L.keys.data();
  int64_t j = 0;
  const int64_t lim = n < cap ? n : cap;
  for (int64_t i = 0; i < lim; ++i) {
    const int64_t qc = probe(i);
    if (qc < 0) { r0[i] = r1[i] = r2[i] = -1; continue; }
    if (j > 0 && keys[j - 1] >= qc - 1)
      j = std::lower_bound(keys, keys + j, qc - 1) - keys;
    while (j < m && keys[j] < qc - 1) ++j;
    int64_t jj = j;
    int32_t v0 = -1, v1 = -1, v2 = -1;
    if (jj < m && keys[jj] == qc - 1) {
      if (xok0(i)) v0 = static_cast<int32_t>(jj);
      ++jj;
    }
    if (jj < m && keys[jj] == qc) {
      v1 = static_cast<int32_t>(jj);
      ++jj;
    }
    if (jj < m && keys[jj] == qc + 1 && xok2(i))
      v2 = static_cast<int32_t>(jj);
    r0[i] = v0;
    r1[i] = v1;
    r2[i] = v2;
  }
}

void subm_plan(const Level& L, int64_t cap, int32_t* out /* [27, cap] */) {
  const int64_t n = static_cast<int64_t>(L.coords.size()) / 3;
  const int32_t* c = L.coords.data();
  int g = 0;
  for (int dz = -1; dz <= 1; ++dz)
    for (int dy = -1; dy <= 1; ++dy, ++g) {
      int32_t* rows = out + static_cast<int64_t>(g) * 3 * cap;
      const int64_t off = (static_cast<int64_t>(dz) * L.h + dy) * L.w;
      merge_tap3(
          L, n, cap, rows, rows + cap, rows + 2 * cap,
          [&](int64_t i) -> int64_t {
            const int64_t z = c[i * 3] + dz, y = c[i * 3 + 1] + dy;
            if (z < 0 || z >= L.d || y < 0 || y >= L.h) return -1;
            return L.keys[i] + off;
          },
          [&](int64_t i) { return c[i * 3 + 2] >= 1; },
          [&](int64_t i) { return c[i * 3 + 2] + 1 < L.w; });
    }
}

void stride_plan(const Level& Lin, const Level& Lout, int64_t cap,
                 int32_t* out /* [27, cap] */) {
  const int64_t n = static_cast<int64_t>(Lout.coords.size()) / 3;
  const int32_t* c = Lout.coords.data();
  int g = 0;
  for (int dz = -1; dz <= 1; ++dz)
    for (int dy = -1; dy <= 1; ++dy, ++g) {
      int32_t* rows = out + static_cast<int64_t>(g) * 3 * cap;
      merge_tap3(
          Lin, n, cap, rows, rows + cap, rows + 2 * cap,
          [&](int64_t i) -> int64_t {
            const int64_t z = 2 * c[i * 3] + dz, y = 2 * c[i * 3 + 1] + dy,
                          x = 2 * c[i * 3 + 2];
            if (z < 0 || z >= Lin.d || y < 0 || y >= Lin.h || x >= Lin.w)
              return -1;
            return key_of(z, y, x, Lin);
          },
          [&](int64_t i) { return 2 * c[i * 3 + 2] >= 1; },
          [&](int64_t i) { return 2 * c[i * 3 + 2] + 1 < Lin.w; });
    }
}

// Transpose of stride_plan: for each level-(L-1) INPUT row j and tap k, the
// level-L OUTPUT row it contributed to (i = 2o + off_k  =>  o = (i-off_k)/2
// when divisible). Drives the gather-based backward of strided convs.
void stride_plan_T(const Level& Lin, const Level& Lout, int64_t cap,
                   int32_t* out /* [27, cap] */) {
  const int64_t n = static_cast<int64_t>(Lin.coords.size()) / 3;
  const int32_t* c = Lin.coords.data();
  int k = 0;
  for (int dz = -1; dz <= 1; ++dz)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dx = -1; dx <= 1; ++dx, ++k)
        merge_tap(Lout, n, cap, out + static_cast<int64_t>(k) * cap,
                  [&](int64_t i) -> int64_t {
                    const int64_t zz = c[i * 3] - dz, yy = c[i * 3 + 1] - dy,
                                  xx = c[i * 3 + 2] - dx;
                    if ((zz & 1) || (yy & 1) || (xx & 1)) return -1;
                    const int64_t z = zz >> 1, y = yy >> 1, x = xx >> 1;
                    if (z < 0 || z >= Lout.d || y < 0 || y >= Lout.h ||
                        x < 0 || x >= Lout.w)
                      return -1;
                    return key_of(z, y, x, Lout);
                  });
}

}  // namespace

extern "C" {

// coords0: [cap0, 3] int32 zyx (-1 rows = padding), level-0 active voxels.
// caps: [4] per-level capacities. dims: [3] zyx of the full-res grid.
// Outputs (preallocated, -1-filled by this function):
//   coords_out[L]: [capL, 3]  (L = 1..3)
//   subm_out[L]:   [27, capL] (L = 0..3)
//   stride_out[L]: [27, capL] (L = 1..3)
//   aux_out[L]:    [27, cap0] (L = 1..3) — for each level-0 voxel, the rows
//                  of the 3x3x3 neighborhood of its level-L parent cell
//                  (drives the aux branch's neighborhood 3-NN interpolation)
// want_train: when 0, the train-only plans (aux neighborhood rings and the
// strided-conv transpose plans, both consumed only by the backward/aux
// paths) are neither cleared nor built — roughly halving rulebook time for
// inference serving.
// Returns 0 on success; n_active written to n_out[4].
int build_plans(const int32_t* coords0, const int64_t* caps,
                const int64_t* dims, int32_t* subm0, int32_t* coords1,
                int32_t* subm1, int32_t* stride1, int32_t* coords2,
                int32_t* subm2, int32_t* stride2, int32_t* coords3,
                int32_t* subm3, int32_t* stride3,
                int32_t* aux1, int32_t* aux2, int32_t* aux3,
                int32_t* strideT1, int32_t* strideT2, int32_t* strideT3,
                int64_t* n_out, int64_t want_train) {
  // -1-fill all outputs here (int32 -1 is 0xFF bytes): lets the caller hand
  // over uninitialized np.empty buffers (np.full was a measurable cost)
  {
    int32_t* bufs27[13] = {subm0, subm1, subm2, subm3, stride1, stride2,
                           stride3, aux1, aux2, aux3, strideT1, strideT2,
                           strideT3};
    const int64_t caps27[13] = {caps[0], caps[1], caps[2], caps[3], caps[1],
                                caps[2], caps[3], caps[0], caps[0], caps[0],
                                caps[0], caps[1], caps[2]};
    const int nbufs = want_train ? 13 : 7;
    for (int b = 0; b < nbufs; ++b)
      std::memset(bufs27[b], 0xFF, sizeof(int32_t) * 27 * caps27[b]);
    int32_t* cbufs[3] = {coords1, coords2, coords3};
    for (int b = 0; b < 3; ++b)
      std::memset(cbufs[b], 0xFF, sizeof(int32_t) * 3 * caps[b + 1]);
  }
  Level levels[4];
  levels[0].d = dims[0];
  levels[0].h = dims[1];
  levels[0].w = dims[2];
  for (int l = 1; l < 4; ++l) {
    levels[l].d = (levels[l - 1].d - 1) / 2 + 1;
    levels[l].h = (levels[l - 1].h - 1) / 2 + 1;
    levels[l].w = (levels[l - 1].w - 1) / 2 + 1;
  }
  // level 0 actives from input coords (key-sorted by contract — the
  // voxelizer emits sorted uniques; re-sort defensively if violated)
  {
    Level& L0 = levels[0];
    L0.coords.reserve(static_cast<size_t>(caps[0]) * 3);
    L0.keys.reserve(caps[0]);
    bool sorted = true;
    for (int64_t i = 0; i < caps[0]; ++i) {
      const int32_t z = coords0[i * 3], y = coords0[i * 3 + 1],
                    x = coords0[i * 3 + 2];
      if (z < 0) continue;
      const int64_t k = key_of(z, y, x, L0);
      if (!L0.keys.empty() && k <= L0.keys.back()) sorted = false;
      L0.keys.push_back(k);
      L0.coords.insert(L0.coords.end(), {z, y, x});
    }
    if (!sorted) {
      std::sort(L0.keys.begin(), L0.keys.end());
      L0.keys.erase(std::unique(L0.keys.begin(), L0.keys.end()),
                    L0.keys.end());
      const int64_t n = static_cast<int64_t>(L0.keys.size());
      L0.coords.resize(n * 3);
      for (int64_t i = 0; i < n; ++i) {
        const int64_t k = L0.keys[i];
        L0.coords[i * 3] = static_cast<int32_t>(k / (L0.h * L0.w));
        L0.coords[i * 3 + 1] = static_cast<int32_t>((k / L0.w) % L0.h);
        L0.coords[i * 3 + 2] = static_cast<int32_t>(k % L0.w);
      }
    }
  }
  // downsample chain: candidates o in {c/2, (c+1)/2} per dim; active set =
  // sorted unique candidates, lowest keys win at the cap (the device's
  // _unique_sorted semantics). Dedup via an occupancy bitmap over the
  // output grid — marking is cache-local (inputs are key-sorted) and the
  // in-order bit sweep emits the sorted active set directly, replacing a
  // sort over ~8x the active count.
  for (int l = 1; l < 4; ++l) {
    Level& up = levels[l - 1];
    Level& lo = levels[l];
    const int64_t n = static_cast<int64_t>(up.coords.size()) / 3;
    const int64_t total = lo.d * lo.h * lo.w;
    std::vector<uint64_t> bm((total + 63) / 64, 0);
    const int64_t lim[3] = {lo.d, lo.h, lo.w};
    for (int64_t i = 0; i < n; ++i) {
      const int64_t c[3] = {up.coords[i * 3], up.coords[i * 3 + 1],
                            up.coords[i * 3 + 2]};
      for (int b = 0; b < 8; ++b) {
        int64_t o[3];
        bool ok = true;
        for (int d = 0; d < 3; ++d) {
          o[d] = (b >> d & 1) ? (c[d] + 1) / 2 : c[d] / 2;
          if (o[d] >= lim[d]) { ok = false; break; }
        }
        if (ok) {
          const uint64_t k =
              static_cast<uint64_t>(key_of(o[0], o[1], o[2], lo));
          bm[k >> 6] |= 1ULL << (k & 63);
        }
      }
    }
    lo.keys.reserve(caps[l]);
    const int64_t nwords = static_cast<int64_t>(bm.size());
    for (int64_t w = 0;
         w < nwords && static_cast<int64_t>(lo.keys.size()) < caps[l]; ++w) {
      uint64_t bits = bm[w];
      while (bits && static_cast<int64_t>(lo.keys.size()) < caps[l]) {
        const int t = __builtin_ctzll(bits);
        lo.keys.push_back((w << 6) + t);
        bits &= bits - 1;
      }
    }
    const int64_t m = static_cast<int64_t>(lo.keys.size());
    lo.coords.resize(m * 3);
    for (int64_t i = 0; i < m; ++i) {
      const int64_t k = lo.keys[i];
      lo.coords[i * 3] = static_cast<int32_t>(k / (lo.h * lo.w));
      lo.coords[i * 3 + 1] = static_cast<int32_t>((k / lo.w) % lo.h);
      lo.coords[i * 3 + 2] = static_cast<int32_t>(k % lo.w);
    }
  }
  // write outputs
  int32_t* coord_bufs[4] = {nullptr, coords1, coords2, coords3};
  int32_t* subm_bufs[4] = {subm0, subm1, subm2, subm3};
  int32_t* stride_bufs[4] = {nullptr, stride1, stride2, stride3};
  int32_t* aux_bufs[4] = {nullptr, aux1, aux2, aux3};
  for (int l = 0; l < 4; ++l) {
    const int64_t n = static_cast<int64_t>(levels[l].coords.size()) / 3;
    n_out[l] = n;
    if (l > 0) {
      std::memcpy(coord_bufs[l], levels[l].coords.data(),
                  sizeof(int32_t) * levels[l].coords.size());
    }
    subm_plan(levels[l], caps[l], subm_bufs[l]);
    if (l > 0) stride_plan(levels[l - 1], levels[l], caps[l], stride_bufs[l]);
  }
  if (!want_train) return 0;
  int32_t* strideT_bufs[4] = {nullptr, strideT1, strideT2, strideT3};
  for (int l = 1; l < 4; ++l)
    stride_plan_T(levels[l - 1], levels[l], caps[l - 1], strideT_bufs[l]);
  // aux neighborhood plans: level-0 voxel -> 3x3x3 ring of its level-L parent
  const Level& L0 = levels[0];
  const int64_t n0 = static_cast<int64_t>(L0.coords.size()) / 3;
  const int32_t* c0 = L0.coords.data();
  for (int l = 1; l < 4; ++l) {
    const Level& L = levels[l];
    int32_t* buf = aux_bufs[l];
    int g = 0;
    for (int dz = -1; dz <= 1; ++dz)
      for (int dy = -1; dy <= 1; ++dy, ++g) {
        int32_t* rows = buf + static_cast<int64_t>(g) * 3 * caps[0];
        merge_tap3(
            L, n0, caps[0], rows, rows + caps[0], rows + 2 * caps[0],
            [&](int64_t i) -> int64_t {
              const int64_t z = (c0[i * 3] >> l) + dz;
              const int64_t y = (c0[i * 3 + 1] >> l) + dy;
              if (z < 0 || z >= L.d || y < 0 || y >= L.h) return -1;
              return key_of(z, y, (c0[i * 3 + 2] >> l), L);
            },
            [&](int64_t i) { return (c0[i * 3 + 2] >> l) >= 1; },
            [&](int64_t i) { return (c0[i * 3 + 2] >> l) + 1 < L.w; });
      }
  }
  return 0;
}

}  // extern "C"
