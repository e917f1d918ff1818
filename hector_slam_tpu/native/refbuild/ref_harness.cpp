// Thin extern-C driver around the ACTUAL reference implementation.
//
// This file contains no algorithm code: it #includes the reference's
// header-only template library verbatim from /root/reference (read-only)
// and instantiates the exact types the hector_mapping node uses —
// HectorSlamProcessor -> MapRepMultiMap -> ScanMatcher<
// OccGridMapUtilConfig<GridMap>> (slam_main/HectorSlamProcessor.h:54,
// slam_main/MapRepMultiMap.h:59-69) — compiled against real Eigen
// (the TensorFlow-bundled headers) with IEEE f32 semantics (-O2, no
// fast-math). Its purpose is to close the round-1 oracle loop (VERDICT
// "What's missing" #1): every bit-exactness claim of the transcribed
// oracles (oracle/oracle_np.py, native/ref_engine.cpp) is validated
// against THIS, the compiled reference itself, in
// tests/test_reference_binary.py.
#include <cstring>
// the reference headers use std::cout without including <iostream>
// (ROS builds pulled it in transitively); provide it first
#include <iostream>

#include "slam_main/HectorSlamProcessor.h"

using hectorslam::DataContainer;
using hectorslam::HectorSlamProcessor;

extern "C" {

void* ref_create(float map_resolution, int map_size_x, int map_size_y,
                 float start_x, float start_y, int levels,
                 float update_factor_free, float update_factor_occupied,
                 float map_update_distance_thresh,
                 float map_update_angle_thresh) {
  HectorSlamProcessor* proc = new HectorSlamProcessor(
      map_resolution, map_size_x, map_size_y,
      Eigen::Vector2f(start_x, start_y), levels);
  proc->setUpdateFactorFree(update_factor_free);
  proc->setUpdateFactorOccupied(update_factor_occupied);
  proc->setMapUpdateMinDistDiff(map_update_distance_thresh);
  proc->setMapUpdateMinAngleDiff(map_update_angle_thresh);
  return proc;
}

void ref_destroy(void* handle) {
  delete static_cast<HectorSlamProcessor*>(handle);
}

void ref_reset(void* handle) {
  static_cast<HectorSlamProcessor*>(handle)->reset();
}

// One scan through HectorSlamProcessor::update. `points` is [n, 2]
// row-major beam endpoints in finest-level map-scale units (the
// DataContainer convention, scan/DataPointContainer.h:92-96), `origo`
// the sensor origin in the same units, `pose_hint` the world-frame
// start estimate. Outputs: world pose [3] and the raw-H "covariance"
// [9] row-major (ScanMatcher.h:184).
void ref_update(void* handle, const float* points, int n,
                const float* origo, const float* pose_hint,
                int map_without_matching, float* out_pose,
                float* out_cov) {
  HectorSlamProcessor* proc = static_cast<HectorSlamProcessor*>(handle);
  DataContainer container(n);
  container.setOrigo(Eigen::Vector2f(origo[0], origo[1]));
  for (int i = 0; i < n; ++i) {
    container.add(Eigen::Vector2f(points[2 * i], points[2 * i + 1]));
  }
  proc->update(container,
               Eigen::Vector3f(pose_hint[0], pose_hint[1], pose_hint[2]),
               map_without_matching != 0);
  const Eigen::Vector3f& pose = proc->getLastScanMatchPose();
  out_pose[0] = pose.x();
  out_pose[1] = pose.y();
  out_pose[2] = pose.z();
  const Eigen::Matrix3f& cov = proc->getLastScanMatchCovariance();
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out_cov[3 * r + c] = cov(r, c);
}

int ref_map_levels(void* handle) {
  return static_cast<HectorSlamProcessor*>(handle)->getMapLevels();
}

void ref_map_dims(void* handle, int level, int* size_x, int* size_y) {
  const hectorslam::GridMap& map =
      static_cast<HectorSlamProcessor*>(handle)->getGridMap(level);
  *size_x = map.getSizeX();
  *size_y = map.getSizeY();
}

// Copy a level's raw log-odds values, row-major [size_y, size_x]
// (flat index y*sizeX+x, map/GridMapBase.h:143).
void ref_get_map(void* handle, int level, float* out) {
  const hectorslam::GridMap& map =
      static_cast<HectorSlamProcessor*>(handle)->getGridMap(level);
  const int n = map.getSizeX() * map.getSizeY();
  for (int i = 0; i < n; ++i) out[i] = map.getCell(i).getValue();
}

float ref_scale_to_map(void* handle) {
  return static_cast<HectorSlamProcessor*>(handle)->getScaleToMap();
}

// --- kernel-level entry points for unit cross-validation ------------------
// These instantiate the reference's hot kernels directly on a raw
// log-odds grid (identity world<->map transform: cellLength=1, offset 0)
// so the transcribed oracles can be checked value-by-value at the lowest
// level, not only end-to-end.

// interpMapValueWithDerivatives (map/OccGridMapUtil.h:287-347) for each
// coords[i] = (x, y) in map coordinates; out[i] = (M, dM/dx, dM/dy).
void ref_interp(const float* log_odds, int size_x, int size_y,
                const float* coords, int n, float* out) {
  hectorslam::GridMap map(1.0f, Eigen::Vector2i(size_x, size_y),
                          Eigen::Vector2f(0.0f, 0.0f));
  const int total = size_x * size_y;
  for (int i = 0; i < total; ++i) map.getCell(i).set(log_odds[i]);
  hectorslam::OccGridMapUtilConfig<hectorslam::GridMap> util(&map);
  for (int i = 0; i < n; ++i) {
    Eigen::Vector3f r = util.interpMapValueWithDerivatives(
        Eigen::Vector2f(coords[2 * i], coords[2 * i + 1]));
    out[3 * i] = r[0];
    out[3 * i + 1] = r[1];
    out[3 * i + 2] = r[2];
  }
}

// getCompleteHessianDerivs (map/OccGridMapUtil.h:64-104): pose in map
// coords, pts [n,2] map-scale beam endpoints; outputs H [9] row-major
// and dTr [3].
void ref_hessian(const float* log_odds, int size_x, int size_y,
                 const float* pose_map, const float* pts, int n,
                 float* out_h, float* out_dtr) {
  hectorslam::GridMap map(1.0f, Eigen::Vector2i(size_x, size_y),
                          Eigen::Vector2f(0.0f, 0.0f));
  const int total = size_x * size_y;
  for (int i = 0; i < total; ++i) map.getCell(i).set(log_odds[i]);
  hectorslam::OccGridMapUtilConfig<hectorslam::GridMap> util(&map);
  DataContainer container(n);
  container.setOrigo(Eigen::Vector2f(0.0f, 0.0f));
  for (int i = 0; i < n; ++i)
    container.add(Eigen::Vector2f(pts[2 * i], pts[2 * i + 1]));
  Eigen::Matrix3f H;
  Eigen::Vector3f dTr;
  util.getCompleteHessianDerivs(
      Eigen::Vector3f(pose_map[0], pose_map[1], pose_map[2]), container, H,
      dTr);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out_h[3 * r + c] = H(r, c);
  for (int r = 0; r < 3; ++r) out_dtr[r] = dTr[r];
}

// util::normalize_angle (util/UtilFunctions.h:37-49), element-wise.
void ref_normalize_angle(const float* in, int n, float* out) {
  for (int i = 0; i < n; ++i) out[i] = util::normalize_angle(in[i]);
}

// ScanMatcher::matchData (matcher/ScanMatcher.h:54-190) on one level
// built from a raw log-odds grid with real map geometry.
void ref_match_data(const float* log_odds, int size_x, int size_y,
                    float cell_length, float off_x, float off_y,
                    const float* begin_world, const float* pts, int n,
                    int max_iterations, float* out_world, float* out_cov) {
  hectorslam::GridMap map(cell_length, Eigen::Vector2i(size_x, size_y),
                          Eigen::Vector2f(off_x, off_y));
  const int total = size_x * size_y;
  for (int i = 0; i < total; ++i) map.getCell(i).set(log_odds[i]);
  hectorslam::OccGridMapUtilConfig<hectorslam::GridMap> util(&map);
  hectorslam::ScanMatcher<
      hectorslam::OccGridMapUtilConfig<hectorslam::GridMap> >
      matcher;
  DataContainer container(n);
  container.setOrigo(Eigen::Vector2f(0.0f, 0.0f));
  for (int i = 0; i < n; ++i)
    container.add(Eigen::Vector2f(pts[2 * i], pts[2 * i + 1]));
  Eigen::Matrix3f cov = Eigen::Matrix3f::Zero();
  Eigen::Vector3f world = matcher.matchData(
      Eigen::Vector3f(begin_world[0], begin_world[1], begin_world[2]),
      util, container, cov, max_iterations);
  out_world[0] = world[0];
  out_world[1] = world[1];
  out_world[2] = world[2];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out_cov[3 * r + c] = cov(r, c);
}

}  // extern "C"
