// Thin extern-"C" glue for MEASURING the reference pipeline's CPU kernels.
//
// The reference's own torch glue (extensions/cpu/*/{grid_subsampling,
// radius_neighbors}.cpp) cannot compile here: its common/torch_helper.h
// includes ATen/cuda headers and this sandbox has CPU-only torch. The pure
// cores (grid_subsampling_cpu.cpp, radius_neighbors_cpu.cpp, cloud.cpp,
// nanoflann) are torch-free, so we compile THEM verbatim from
// /root/reference and expose this ctypes-loadable facade. Used only by
// tools/bench_torch_baseline.py to time the genuine reference collate —
// this is baseline-measurement harness code, not part of the framework.
//
// Two-call protocol per op (output sizes are data-dependent):
//   1) ref_*() runs the reference core, stashes results, returns the size.
//   2) ref_*_fetch() copies the stashed results into caller buffers.

#include <cstring>
#include <vector>

#include "cpu/grid_subsampling/grid_subsampling_cpu.h"
#include "cpu/radius_neighbors/radius_neighbors_cpu.h"

static std::vector<PointXYZ> g_s_points;
static std::vector<long> g_s_lengths;
static std::vector<long> g_neighbors;

extern "C" {

// returns the total number of subsampled points
long ref_grid_subsample(const float* points, const long* lengths, long batch,
                        long total, float voxel_size) {
  std::vector<PointXYZ> pts(reinterpret_cast<const PointXYZ*>(points),
                            reinterpret_cast<const PointXYZ*>(points) + total);
  std::vector<long> lens(lengths, lengths + batch);
  g_s_points.clear();
  g_s_lengths.clear();
  grid_subsampling_cpu(pts, g_s_points, lens, g_s_lengths, voxel_size);
  return static_cast<long>(g_s_points.size());
}

void ref_grid_subsample_fetch(float* out_points, long* out_lengths, long batch) {
  std::memcpy(out_points, g_s_points.data(), g_s_points.size() * 3 * sizeof(float));
  std::memcpy(out_lengths, g_s_lengths.data(), batch * sizeof(long));
}

// returns max_count (the padded column width); matrix is (total_q, max_count)
long ref_radius_neighbors(const float* q_points, const float* s_points,
                          const long* q_lengths, const long* s_lengths,
                          long batch, long total_q, long total_s, float radius) {
  std::vector<PointXYZ> qv(reinterpret_cast<const PointXYZ*>(q_points),
                           reinterpret_cast<const PointXYZ*>(q_points) + total_q);
  std::vector<PointXYZ> sv(reinterpret_cast<const PointXYZ*>(s_points),
                           reinterpret_cast<const PointXYZ*>(s_points) + total_s);
  std::vector<long> qlv(q_lengths, q_lengths + batch);
  std::vector<long> slv(s_lengths, s_lengths + batch);
  g_neighbors.clear();
  radius_neighbors_cpu(qv, sv, qlv, slv, g_neighbors, radius);
  return static_cast<long>(g_neighbors.size() / total_q);
}

void ref_radius_neighbors_fetch(long* out) {
  std::memcpy(out, g_neighbors.data(), g_neighbors.size() * sizeof(long));
}

}  // extern "C"
