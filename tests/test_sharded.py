"""Sharded execution tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvo_slam_tpu.config import TrackerConfig
from dvo_slam_tpu.models import dense_tracker
from dvo_slam_tpu.ops import camera, pyramid
from dvo_slam_tpu.parallel import sharded
from dvo_slam_tpu.utils import se3_np, synthetic


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded.make_mesh(8)  # (4, 2): batch x pixel


def _pair(W=64, H=32, num_levels=2):
    K_t = (W * 0.8, W * 0.8, (W - 1) / 2, (H - 1) / 2)
    scene = synthetic.two_plane_scene()
    T_rel = se3_np.exp(np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.005]))
    i0, z0 = scene.render(np.asarray(K_t), W, H, np.eye(4))
    i1, z1 = scene.render(np.asarray(K_t), W, H, se3_np.inverse(T_rel))
    Ks = camera.pyramid_intrinsics(camera.intrinsics(*K_t), num_levels)
    ref = pyramid.build_pyramid(jnp.asarray(i0), jnp.asarray(z0), num_levels)
    cur = pyramid.build_pyramid(jnp.asarray(i1), jnp.asarray(z1), num_levels)
    return ref, cur, Ks, T_rel


def test_sharded_matches_single_device(mesh):
    """Pixel-sharded + batch-sharded tracking must reproduce the
    single-device result to float tolerance."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=10)
    ref, cur, Ks, T_rel = _pair()
    B = 4
    refs = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in ref)
    curs = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in cur)
    T0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    fn = sharded.sharded_track_pairs(mesh, cfg)
    res_sharded = fn(refs, curs, Ks, T0)

    res_single = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg)

    np.testing.assert_allclose(
        np.asarray(res_sharded.transformation[0]),
        np.asarray(res_single.transformation),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        float(res_sharded.valid_pixels[0]), float(res_single.valid_pixels), rtol=1e-6
    )
    # All batch rows identical inputs -> identical outputs.
    np.testing.assert_allclose(
        np.asarray(res_sharded.transformation[0]),
        np.asarray(res_sharded.transformation[3]),
        atol=1e-6,
    )


def test_batch_sequences_sharded(mesh):
    """Sequence-batch odometry sharded over the mesh == unsharded."""
    from dvo_slam_tpu.parallel import batch_slam

    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=8)
    K_t = (32.0, 32.0, 31.5, 23.5)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(4, radius=0.03)
    frames = synthetic.render_sequence(scene, np.asarray(K_t), 64, 48, poses)
    seq_i = jnp.stack([jnp.asarray(f[0]) for f in frames])
    seq_z = jnp.stack([jnp.asarray(f[1]) for f in frames])
    B = 8
    batch_i = jnp.broadcast_to(seq_i, (B,) + seq_i.shape)
    batch_z = jnp.broadcast_to(seq_z, (B,) + seq_z.shape)
    K = camera.intrinsics(*K_t)

    out_sharded = batch_slam.track_sequences_sharded(
        mesh, batch_i, batch_z, K, cfg
    )
    out_local = batch_slam.track_sequences_batched(batch_i, batch_z, K, cfg)
    np.testing.assert_allclose(
        np.asarray(out_sharded["rel_poses"]),
        np.asarray(out_local["rel_poses"]),
        atol=1e-5,
    )
    assert out_sharded["rel_poses"].shape == (B, 3, 4, 4)


def test_keyframe_sequences_sharded(mesh):
    """The keyframe FRONT-END fleet (dual alignment + entropy switching in
    one scan per sequence) sharded over the mesh == unsharded, and the
    forced keyframe cadence survives the sharding."""
    from dvo_slam_tpu.config import SlamConfig
    from dvo_slam_tpu.parallel import batch_slam

    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=8)
    slam_cfg = SlamConfig(local_map_optimize=False)
    K_t = (32.0, 32.0, 31.5, 23.5)
    scene = synthetic.two_plane_scene()
    poses = synthetic.orbit_trajectory(5, radius=0.03)
    frames = synthetic.render_sequence(scene, np.asarray(K_t), 64, 48, poses)
    seq_i = jnp.stack([jnp.asarray(f[0]) for f in frames])
    seq_z = jnp.stack([jnp.asarray(f[1]) for f in frames])
    B = 8
    batch_i = jnp.broadcast_to(seq_i, (B,) + seq_i.shape)
    batch_z = jnp.broadcast_to(seq_z, (B,) + seq_z.shape)
    force = jnp.broadcast_to(jnp.asarray([False, False, True, False, False]),
                             (B, 5))
    K = camera.intrinsics(*K_t)

    out_sh = batch_slam.keyframe_sequences_sharded(
        mesh, batch_i, batch_z, K, cfg, slam_cfg, force_keyframe=force
    )
    out_local = batch_slam.keyframe_sequences_batched(
        batch_i, batch_z, K, cfg, slam_cfg, force_keyframe=force
    )
    np.testing.assert_allclose(
        np.asarray(out_sh["rel_pose"]), np.asarray(out_local["rel_pose"]),
        atol=1e-5,
    )
    assert out_sh["rel_pose"].shape == (B, 4, 4, 4)
    switch = np.asarray(out_sh["switch"])
    assert switch[:, 1].all()  # forced keyframe at frame index 2
    np.testing.assert_array_equal(switch, np.asarray(out_local["switch"]))


def test_sharded_pose_graph_build_matches(mesh):
    """Edge-sharded Hessian assembly == single-device assembly."""
    from dvo_slam_tpu.models import pose_graph

    rng = np.random.default_rng(0)
    M, E = 8, 16
    g = pose_graph.empty_graph(M, E)
    poses = jnp.stack([
        jnp.asarray(se3_np.exp(rng.normal(scale=0.2, size=6)), jnp.float32)
        for _ in range(M)
    ])
    ei = jnp.asarray(rng.integers(0, M - 1, E), jnp.int32)
    ej = (ei + 1) % M
    Z = jnp.stack([
        jnp.asarray(se3_np.exp(rng.normal(scale=0.05, size=6)), jnp.float32)
        for _ in range(E)
    ])
    info = jnp.broadcast_to(jnp.eye(6), (E, 6, 6)).astype(jnp.float32)
    mask = jnp.ones(E, bool)

    build = sharded.sharded_pose_graph_build(mesh)
    H_sh, g_sh = build(poses, ei, ej, Z, info, mask)

    g2 = g._replace(
        poses=poses, num_vertices=jnp.asarray(M, jnp.int32),
        edge_i=ei, edge_j=ej, measurements=Z, information=info,
        edge_mask=mask, num_edges=jnp.asarray(E, jnp.int32),
    )
    H_ref, g_ref, _, _ = jax.jit(
        lambda gg: pose_graph._build_system(gg, False, 1.0)
    )(g2)
    # Single-device build adds the gauge prior to block (0,0); removing a
    # stored f32 1e6 leaves ~0.06 cancellation noise, so exclude that
    # block's diagonal from the comparison instead.
    H_ref = np.asarray(H_ref, np.float64)
    H_sh = np.array(H_sh, np.float64)
    H_ref[:6, :6] = 0.0
    H_sh[:6, :6] = 0.0
    np.testing.assert_allclose(H_sh, H_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-3)


def test_sharded_validation_fleet_matches(mesh):
    """The mesh-sharded validation fleet (candidates x directions on
    'batch') must reproduce the single-device batched validator results."""
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=8)
    ref, cur, Ks, T_rel = _pair()
    B = 2  # 2B = 4 rows over the 4-way batch axis
    cands = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in ref)
    T0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    fleet = sharded.sharded_validation_fleet(mesh, cfg)
    fwd, bwd = fleet(cands, cur, Ks, T0)

    curs = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in cur)
    fwd_ref = dense_tracker.track_pairs_batched(cands, curs, Ks, T0, cfg)
    bwd_ref = dense_tracker.track_pairs_batched(curs, cands, Ks, T0, cfg)

    np.testing.assert_allclose(
        np.asarray(fwd.transformation), np.asarray(fwd_ref.transformation),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(bwd.transformation), np.asarray(bwd_ref.transformation),
        atol=5e-5,
    )
    # Cross-validation consistency: forward o backward ~ identity.
    T_fb = np.asarray(fwd.transformation[0], np.float64) @ np.asarray(
        bwd.transformation[0], np.float64
    )
    assert np.linalg.norm(se3_np.log(T_fb)) < 5e-3


def test_make_mesh_honors_explicit_axes():
    """A caller-supplied dp or sp must not be clobbered by the default
    factorization (make_mesh(dp=8) means pure batch-parallel)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    assert sharded.make_mesh(8, dp=8).devices.shape == (8, 1)
    assert sharded.make_mesh(8, sp=4).devices.shape == (2, 4)
    assert sharded.make_mesh(8, dp=2, sp=4).devices.shape == (2, 4)
    with pytest.raises(ValueError):
        sharded.make_mesh(8, dp=3)


def test_sharded_pallas_sampler_matches_single_device(mesh):
    """The pallas one-hot sampler under pixel sharding (interpret mode on
    the CPU mesh): each shard samples with its row-offset reference grid
    against the replicated current slab. Geometry is explicit (sample_slab
    width arg) — a shard's point count alone would silently imply a wrong
    image width (SURVEY.md §2.5 P1 x P4 interaction)."""
    import dataclasses

    # W=128 so the fine level admits rows_per_tile=1 per 16-row shard.
    cfg = TrackerConfig(num_levels=2, first_level=1, last_level=0,
                        max_iterations=8, sampler_backend="pallas",
                        pallas_precision="highest", pallas_rows_per_tile=2,
                        pallas_margin=8)
    ref, cur, Ks, T_rel = _pair(W=128, H=32)
    B = 4
    refs = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in ref)
    curs = tuple(jnp.broadcast_to(l, (B,) + l.shape) for l in cur)
    T0 = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))

    fn = sharded.sharded_track_pairs(mesh, cfg)
    res_sharded = fn(refs, curs, Ks, T0)

    cfg_g = dataclasses.replace(cfg, sampler_backend="gather")
    res_single = dense_tracker.track_jit(ref, cur, Ks, jnp.eye(4), cfg_g)

    np.testing.assert_allclose(
        np.asarray(res_sharded.transformation[0]),
        np.asarray(res_single.transformation),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        float(res_sharded.valid_pixels[0]),
        float(res_single.valid_pixels), rtol=1e-3,
    )
    err = np.linalg.norm(se3_np.log(
        np.asarray(res_sharded.transformation[0], np.float64)
        @ se3_np.inverse(T_rel)
    ))
    assert err < 2e-3
