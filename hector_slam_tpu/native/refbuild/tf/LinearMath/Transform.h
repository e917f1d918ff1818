// Minimal stand-in for ROS tf/LinearMath/Transform.h so the reference's
// header-only library (/root/reference/hector_mapping/include/
// hector_slam_lib/util/UtilFunctions.h:33,94-97) parses outside a catkin
// workspace. Only the single helper `util::getYawFromQuat` touches tf; the
// harness never calls it, but the inline definition must still compile.
// This is a local test-infrastructure stub, not a tf implementation.
#ifndef HECTOR_REFBUILD_TF_STUB_H
#define HECTOR_REFBUILD_TF_STUB_H

#include <cmath>

namespace geometry_msgs {
struct Quaternion {
  double x, y, z, w;
};
}  // namespace geometry_msgs

namespace tf {

struct Quaternion {
  double x_, y_, z_, w_;
  Quaternion(double x, double y, double z, double w)
      : x_(x), y_(y), z_(z), w_(w) {}
};

// yaw from quaternion, same formula tf::getYaw resolves to
inline double getYaw(const Quaternion& q) {
  return std::atan2(2.0 * (q.w_ * q.z_ + q.x_ * q.y_),
                    1.0 - 2.0 * (q.y_ * q.y_ + q.z_ * q.z_));
}

}  // namespace tf

#endif
