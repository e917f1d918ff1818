"""Attitude utilities — the hector_imu_attitude_to_tf and hector_imu_tools
equivalents (src/imu_attitude_to_tf_node.cpp:45-59,
src/pose_and_orientation_to_imu_node.cpp:65-159) without ROS/tf: pure
quaternion math for fusing the planar SLAM yaw with IMU roll/pitch.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quaternion_to_rpy(q) -> Tuple[float, float, float]:
    """(roll, pitch, yaw) from (x, y, z, w), ZYX convention (matches
    tf::Matrix3x3::getRPY used by the reference nodes)."""
    x, y, z, w = (float(v) for v in q)
    roll = np.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = 2.0 * (w * y - z * x)
    pitch = np.arcsin(np.clip(sinp, -1.0, 1.0))
    yaw = np.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return float(roll), float(pitch), float(yaw)


def rpy_to_quaternion(roll: float, pitch: float,
                      yaw: float) -> Tuple[float, float, float, float]:
    """(x, y, z, w) from ZYX Euler angles."""
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return (
        float(sr * cp * cy - cr * sp * sy),
        float(cr * sp * cy + sr * cp * sy),
        float(cr * cp * sy - sr * sp * cy),
        float(cr * cp * cy + sr * sp * sy),
    )


def attitude_to_stabilized_transform(imu_quat):
    """base_stabilized -> base_link rotation: roll/pitch only, yaw
    dropped (imu_attitude_to_tf_node.cpp:45-59)."""
    roll, pitch, _ = quaternion_to_rpy(imu_quat)
    return rpy_to_quaternion(roll, pitch, 0.0)


def fuse_pose_and_attitude(slam_pose, imu_quat):
    """Fused orientation: SLAM yaw + IMU roll/pitch
    (pose_and_orientation_to_imu_node.cpp:100-120). Returns (x,y,z,w)."""
    roll, pitch, _ = quaternion_to_rpy(imu_quat)
    return rpy_to_quaternion(roll, pitch, float(slam_pose[2]))
