"""Multi-chip scaling via jax.sharding meshes.

The reference is a single-process robotics system (SURVEY.md §2.5); its
concurrency (SSE lanes, TBB tasks, a background g2o thread, ROS pub/sub)
maps to a single chip's VPU/MXU + XLA async dispatch. The mesh axes here are
the genuinely new scaling capability:

  * 'batch'  — data parallelism over independent sequences / frame pairs
               (batch SLAM, loop-closure validation fleets);
  * 'pixel'  — the image's pixel rows sharded across chips, with the 6x6
               normal equations reduced by psum over ICI (the structural
               analog of sequence parallelism for this workload);
  * edges    — pose-graph edge fan-out with psum'd Hessian assembly.
"""
