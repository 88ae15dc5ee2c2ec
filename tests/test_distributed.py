"""Distributed BA / PGO tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slslam_tpu import geometry as geo
from slslam_tpu.config import CameraConfig
from slslam_tpu.ops.pose_graph import pose_graph_opt
from slslam_tpu.ops.schur_ba import local_ba
from slslam_tpu.parallel import dist_local_ba, dist_pose_graph_opt, make_mesh

from test_ba import make_problem

CAM = CameraConfig()
BL = CAM.baseline


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh(jax.devices())


def padded_ba_problem(num_cams=4, noise_px=0.3, pad_obs=1024):
    cam_wt, gt_lines, obs, obs_cam, obs_line, _ = make_problem(
        num_cams=num_cams, noise_px=noise_px, seed=1)
    rng = np.random.default_rng(42)
    L, O, C = len(gt_lines), len(obs), num_cams
    orth_gt = np.asarray(geo.av_to_orth(jnp.asarray(gt_lines)))
    cam0 = cam_wt.copy()
    cam0[1:] += rng.standard_normal((C - 1, 6)) * 0.02
    orth0 = orth_gt + rng.standard_normal((L, 4)) * 0.005
    cam_free = np.ones(C, bool)
    cam_free[0] = False

    obs_p = np.zeros((pad_obs, 8)); obs_p[:O] = obs
    oc = np.zeros(pad_obs, np.int32); oc[:O] = obs_cam
    ol = np.zeros(pad_obs, np.int32); ol[:O] = obs_line
    valid = np.zeros(pad_obs, bool); valid[:O] = True

    return (jnp.asarray(cam0), jnp.asarray(orth0), jnp.asarray(obs_p),
            jnp.asarray(oc), jnp.asarray(ol), jnp.asarray(valid),
            jnp.asarray(cam_free), jnp.ones(L, bool))


class TestDistBA:
    def test_matches_single_device(self, mesh):
        args = padded_ba_problem()
        cam_s, line_s, stats_s = local_ba(*args, BL, 1.0 / CAM.focal_length)
        cam_d, line_d, stats_d = dist_local_ba(mesh, *args, BL,
                                               1.0 / CAM.focal_length)
        np.testing.assert_allclose(np.asarray(cam_d), np.asarray(cam_s),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(line_d), np.asarray(line_s),
                                   rtol=1e-8, atol=1e-10)
        assert int(stats_d.iterations) == int(stats_s.iterations)

    def test_solution_quality(self, mesh):
        args = padded_ba_problem()
        cam_d, _, stats = dist_local_ba(mesh, *args, BL,
                                        1.0 / CAM.focal_length)
        assert float(stats.final_cost) < float(stats.initial_cost)
        assert not np.any(np.isnan(np.asarray(cam_d)))


def pgo_ring_problem(V=32, E_pad=64, drift=0.05, seed=0):
    """A noisy loop: V poses around a circle, sequential + loop-closure
    edges, initial poses drifted."""
    rng = np.random.default_rng(seed)
    # ground truth poses: yaw around circle
    gt = []
    for i in range(V):
        ang = 2 * np.pi * i / V
        wt = np.array([0.0, ang, 0.0, np.sin(ang) * 3, 0.0, np.cos(ang) * 3])
        gt.append(wt)
    gt = np.stack(gt)

    def rel(a, b):
        Ra, ta = np.asarray(geo.wt_to_Rt(jnp.asarray(a))[0]), a[3:]
        Rb, tb = np.asarray(geo.wt_to_Rt(jnp.asarray(b))[0]), b[3:]
        # T_b * T_a^-1
        R = Rb @ Ra.T
        t = tb - R @ ta
        return np.concatenate([
            np.asarray(geo.so3_log(jnp.asarray(R))), t])

    ei, ej, ctr = [], [], []
    for i in range(V - 1):
        ei.append(i); ej.append(i + 1); ctr.append(rel(gt[i], gt[i + 1]))
    # loop edge
    ei.append(V - 1); ej.append(0); ctr.append(rel(gt[V - 1], gt[0]))
    E = len(ei)

    poses0 = gt + rng.standard_normal(gt.shape) * drift
    poses0[0] = gt[0]

    ei_p = np.zeros(E_pad, np.int32); ei_p[:E] = ei
    ej_p = np.zeros(E_pad, np.int32); ej_p[:E] = ej
    ctr_p = np.zeros((E_pad, 6)); ctr_p[:E] = np.stack(ctr)
    ev = np.zeros(E_pad, bool); ev[:E] = True
    free = np.ones(V, bool); free[0] = False

    return (jnp.asarray(poses0), jnp.asarray(ei_p), jnp.asarray(ej_p),
            jnp.asarray(ctr_p), jnp.asarray(ev), jnp.asarray(free)), gt


class TestPGO:
    def test_converges_to_ground_truth(self):
        args, gt = pgo_ring_problem()
        out, stats = pose_graph_opt(*args, max_iters=30)
        out = np.asarray(out)
        # residual cost ~ 0 and poses back at ground truth (gauge-fixed)
        assert float(stats.final_cost) < 1e-12
        np.testing.assert_allclose(out, gt, atol=1e-4)

    def test_ten_iteration_cap(self):
        args, gt = pgo_ring_problem(drift=0.02)
        out, stats = pose_graph_opt(*args, max_iters=10)
        assert int(stats.iterations) <= 10
        assert float(stats.final_cost) < float(stats.initial_cost) * 1e-3

    def test_dist_matches_single(self, mesh):
        args, gt = pgo_ring_problem()
        out_s, stats_s = pose_graph_opt(*args, max_iters=10)
        out_d, stats_d = dist_pose_graph_opt(mesh, *args, max_iters=10)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                                   rtol=1e-8, atol=1e-10)


class TestDistBALines:
    def test_line_sharded_matches_single(self, mesh):
        from slslam_tpu.parallel.dist_ba import (dist_local_ba_lines,
                                                 partition_by_line)
        args = padded_ba_problem()
        (cam0, orth0, obs_p, oc, ol, valid, cam_free, line_free) = args
        cam_s, line_s, stats_s = local_ba(*args, BL, 1.0 / CAM.focal_length)

        lo, lf, ob, oc_sh, ol_sh, ov, perm = partition_by_line(
            np.asarray(orth0), np.asarray(line_free), np.asarray(obs_p),
            np.asarray(oc), np.asarray(ol), np.asarray(valid), 8)
        cam_d, line_d, stats_d = dist_local_ba_lines(
            mesh, cam0, jnp.asarray(lo), jnp.asarray(ob),
            jnp.asarray(oc_sh), jnp.asarray(ol_sh), jnp.asarray(ov),
            args[6], jnp.asarray(lf), BL, 1.0 / CAM.focal_length)
        # un-permute lines back to global order
        line_flat = np.asarray(line_d).reshape(-1, 4)
        line_back = line_flat[perm]

        np.testing.assert_allclose(np.asarray(cam_d), np.asarray(cam_s),
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(line_back, np.asarray(line_s),
                                   rtol=1e-7, atol=1e-9)
        assert int(stats_d.iterations) == int(stats_s.iterations)


class TestEngineDistributed:
    def test_engine_with_mesh_matches_single(self):
        import dataclasses
        from slslam_tpu.config import SlamConfig
        from slslam_tpu.engine import Slam
        from slslam_tpu.evalio.writers import trajectory_rows
        from slslam_tpu.sim import (StereoLineRenderer, house_segments,
                                    wave_trajectory)

        segs = house_segments()
        poses = wave_trajectory(num_frames=24)
        ren = StereoLineRenderer(segs, CameraConfig(), noise_px=0.3, seed=1)
        frames = [ren.observe(T) for T in poses]

        def run(mesh_devices):
            cfg = dataclasses.replace(SlamConfig(),
                                      compute_dtype="float64",
                                      mesh_devices=mesh_devices)
            slam = Slam(cfg)
            for i, obs in enumerate(frames):
                slam.process_frame(obs, i)
            return trajectory_rows(slam.trajectory())

        t1 = run(0)
        t8 = run(8)
        np.testing.assert_allclose(t8, t1, atol=1e-8)
