"""dvo_slam_tpu — TPU-native dense RGB-D visual odometry & SLAM.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``tum-vision/dvo_slam`` (C++/ROS/SSE, see SURVEY.md): dense coarse-to-fine
photometric+geometric RGB-D image alignment with t-distribution robust IRLS
and analytic 6-DoF Jacobians (reference: dvo_core/src/dense_tracking.cpp,
DenseTracker::match), entropy-ratio keyframe selection (dvo_slam
TrackingResultEvaluation), and a keyframe pose-graph backend replacing g2o
with a batched device-resident SE(3) graph solver (dvo_slam/src/
keyframe_graph.cpp equivalent).

Layering (mirrors SURVEY.md §1 but TPU-first):
  ops/       — SE(3), camera, interpolation, pyramids, residuals, robust
               weighting, normal equations; Pallas kernels in ops/pallas/.
  models/    — DenseTracker (odometry engine), KeyframeTracker (SLAM
               facade), pose-graph optimizer, loop-closure validation.
  parallel/  — jax.sharding mesh utilities: batch-of-sequences data
               parallelism and pixel-sharded normal-equation reduction.
  utils/     — TUM dataset IO, trajectory serialization, ATE/RPE
               evaluation, synthetic RGB-D scene rendering.
  native/    — C++ host runtime (PNG decode + prefetching data loader).
"""

import jax as _jax

# JAX's default matmul precision emulates bf16 passes even for f32 inputs
# (measured 3.5e-3 relative error on 3x3 products with jax 0.9.0) — fatal
# for SE(3) composition and 6x6 normal equations. This framework requires
# true-f32 matmuls by default; throughput-critical image-scale matmuls opt
# in to bf16 explicitly (ops/pallas kernels control their own precision).
_jax.config.update("jax_default_matmul_precision", "highest")

from dvo_slam_tpu.config import TrackerConfig, SlamConfig

__version__ = "0.2.0"

__all__ = ["TrackerConfig", "SlamConfig", "KeyframeSlam", "OdometryTracker",
           "__version__"]


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing the model stack — and
    # compiling nothing — until actually used).
    if name == "KeyframeSlam":
        from dvo_slam_tpu.models.keyframe_tracker import KeyframeSlam

        return KeyframeSlam
    if name == "OdometryTracker":
        from dvo_slam_tpu.models.odometry import OdometryTracker

        return OdometryTracker
    raise AttributeError(name)
