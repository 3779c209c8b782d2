"""fastliosam_tpu — a TPU-native LiDAR-inertial SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of the FAST-LIO-SAM_GPS reference
stack (see SURVEY.md): FAST-LIO2-style iterated error-state Kalman odometry with
point-to-plane matching against an incremental voxel-surfel map, keyframing,
radius-search loop detection with ICP verification, and a batched Gauss-Newton /
Levenberg-Marquardt pose-graph optimizer with GPS unary factors — all designed
TPU-first: static shapes, masked padded arrays, scatter/gather voxel hashing,
MXU brute-force nearest neighbors, `lax.scan` pipelines and shardable keyframe
axes via `jax.sharding`.

Subpackages (mapping to SURVEY.md §7 build plan):
  core        SO3/SE3 batched ops, 3x3 eig, padded point clouds, geodesy
  map         device-resident voxel-hash surfel map (replaces ikd-Tree)
  odom        IMU propagation, deskew, iterated ESKF (FAST-LIO2 capability)
  ops         Pallas kernels + MXU nearest-neighbor primitives
  pgo         factor-graph storage + batched GN/LM solver (replaces iSAM2)
  loop        loop candidate search + batched ICP verification
  runtime     the dataset-driven engine (replaces the ROS node wiring)
  parallel    mesh/sharding helpers, distributed PGO
  io          dataset readers (KITTI/...), PCD codec, TUM/KITTI pose files
  sim         synthetic world generator (scans + IMU + GPS from a trajectory)
  postprocess trajectory/GPS alignment, georeferencing, map cleanup
  eval        ATE / RPE metrics
"""

__version__ = "0.1.0"
