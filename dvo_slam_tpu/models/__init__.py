"""Model layer: dense tracker (odometry engine) and SLAM orchestration."""
