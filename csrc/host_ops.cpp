// Native host-side ops for the data pipeline / deploy preprocessing.
//
// TPU-native equivalent of the reference's host C++ surface: the deploy
// runners re-implement hard voxelization on the host
// (reference: deploy/pointpillars/python/infer.py:110-163 numba, and the
// deploy/*/cpp mains); the gt-database tool needs fast point-in-box tests.
// Built as a plain shared library, bound via ctypes (no pybind11 in image).
//
// All functions use C ABI, row-major float32 buffers.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// Hard voxelization (first-arrival semantics, matching ops/voxelize.py).
// points:  [n, c]  (c >= 3)
// voxels:  [max_voxels, max_points, c]  (zeroed by caller)
// coords:  [max_voxels, 3]  (z, y, x)
// num_points_per_voxel: [max_voxels]
// returns: number of voxels produced (<= max_voxels)
int hard_voxelize_host(const float* points, int n, int c,
                       const float* voxel_size, const float* pc_range,
                       int max_points, int max_voxels, float* voxels,
                       int* coords, int* num_points_per_voxel) {
  const float vx = voxel_size[0], vy = voxel_size[1], vz = voxel_size[2];
  const float x0 = pc_range[0], y0 = pc_range[1], z0 = pc_range[2];
  const int gx = static_cast<int>(std::round((pc_range[3] - x0) / vx));
  const int gy = static_cast<int>(std::round((pc_range[4] - y0) / vy));
  const int gz = static_cast<int>(std::round((pc_range[5] - z0) / vz));

  std::unordered_map<int64_t, int> table;
  table.reserve(max_voxels * 2);
  int n_voxels = 0;

  for (int i = 0; i < n; ++i) {
    const float* p = points + i * c;
    if (!std::isfinite(p[0]) || !std::isfinite(p[1]) ||
        !std::isfinite(p[2])) {
      continue;
    }
    const int ix = static_cast<int>(std::floor((p[0] - x0) / vx));
    const int iy = static_cast<int>(std::floor((p[1] - y0) / vy));
    const int iz = static_cast<int>(std::floor((p[2] - z0) / vz));
    if (ix < 0 || ix >= gx || iy < 0 || iy >= gy || iz < 0 || iz >= gz) {
      continue;
    }
    const int64_t key =
        (static_cast<int64_t>(iz) * gy + iy) * gx + ix;
    auto it = table.find(key);
    int v;
    if (it == table.end()) {
      if (n_voxels >= max_voxels) continue;
      v = n_voxels++;
      table.emplace(key, v);
      coords[v * 3 + 0] = iz;
      coords[v * 3 + 1] = iy;
      coords[v * 3 + 2] = ix;
    } else {
      v = it->second;
    }
    int& cnt = num_points_per_voxel[v];
    if (cnt < max_points) {
      std::memcpy(voxels + (static_cast<int64_t>(v) * max_points + cnt) * c,
                  p, sizeof(float) * c);
      ++cnt;
    }
  }
  return n_voxels;
}

// Point-in-rotated-BEV-box test (z extent included).
// points: [n, >=3] (stride point_stride); boxes: [m, 7]
// (x, y, z_bottom, w, l, h, yaw); out: [n, m] uint8
void points_in_boxes_host(const float* points, int n, int point_stride,
                          const float* boxes, int m, uint8_t* out) {
  for (int j = 0; j < m; ++j) {
    const float* b = boxes + j * 7;
    const float cx = b[0], cy = b[1], zb = b[2];
    const float hw = b[3] * 0.5f, hl = b[4] * 0.5f, h = b[5];
    const float cos_y = std::cos(b[6]), sin_y = std::sin(b[6]);
    for (int i = 0; i < n; ++i) {
      const float* p = points + static_cast<int64_t>(i) * point_stride;
      const float dx = p[0] - cx, dy = p[1] - cy, dz = p[2] - zb;
      // rotate into the box frame (inverse of CCW yaw)
      const float lx = cos_y * dx + sin_y * dy;
      const float ly = -sin_y * dx + cos_y * dy;
      out[static_cast<int64_t>(i) * m + j] =
          (std::fabs(lx) <= hw && std::fabs(ly) <= hl && dz >= 0.f &&
           dz <= h)
              ? 1
              : 0;
    }
  }
}

}  // extern "C"
