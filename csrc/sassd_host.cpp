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
