"""ROS node adapter: message time-ordering behavior, without a ROS
master (reference xrslam-ros/src/xrslam-ros/src/xrslam_node.cpp buffers
images until the IMU stream passes them, :95-130)."""

import numpy as np

from xrslam_tpu.config import Config
from xrslam_tpu.tools.ros_node import RosVioNode


def test_image_buffers_until_imu_catches_up():
    n = RosVioNode(Config())
    img = np.zeros((48, 64), np.float32)

    n.handle_image(0.05, img)
    assert len(n._pending_images) == 1  # no IMU yet

    for i in range(8):  # IMU up to 0.035 < image time
        n.handle_imu(0.005 * i, np.zeros(3), np.array([0, 0, 9.81]))
    assert len(n._pending_images) == 1

    for i in range(8, 14):  # IMU passes the image timestamp
        n.handle_imu(0.005 * i, np.zeros(3), np.array([0, 0, 9.81]))
    assert len(n._pending_images) == 0

    # out-of-order-safe: a second image arrives before its IMU
    n.handle_image(0.1, img)
    assert len(n._pending_images) == 1
    for i in range(14, 22):
        n.handle_imu(0.005 * i, np.zeros(3), np.array([0, 0, 9.81]))
    assert len(n._pending_images) == 0


def test_undistortion_applied_at_ingest():
    cfg = Config(
        camera_intrinsic=np.array([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]]),
        camera_resolution=(64, 48),
        camera_distortion_flag=True,
        camera_distortion=np.array([-0.2, 0.05, 0.0, 0.0]),
    )
    n = RosVioNode(cfg)
    assert n._undistort is not None
    published = []
    n.slam.push_sensor_data = lambda ty, t, d: published.append((ty, d))
    n.slam.run_one_frame = lambda: None
    n.handle_imu(0.0, np.zeros(3), np.array([0, 0, 9.81]))
    rng = np.random.default_rng(0)
    n.handle_image(-0.01, rng.uniform(0, 1, (48, 64)).astype(np.float32))
    cam = [d for ty, d in published if getattr(ty, "name", "") == "CAMERA"]
    assert len(cam) == 1 and cam[0].shape == (48, 64)
