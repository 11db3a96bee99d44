"""System facade — the public API, mirroring the reference's System class
(reference: include/System.h:105-198, src/System.cc:43-252): construct with a
config, call track_monocular/track_rgbd/track_stereo per frame, save
trajectories, shutdown.

Two-rate loop instead of three threads (SURVEY.md §7): per-frame tracking
plus an inline mapping step whenever a keyframe is inserted; loop closing
runs as an occasional device program (slam/loopclosing.py).
"""
from __future__ import annotations

import enum
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import state as mstate
from dani_slam_tpu.slam import mapping, tracking
from dani_slam_tpu.slam.frame import (FrameFeatures, build_frame_mono,
                                      build_frame_rgbd)


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4
    IMU_RGBD = 5


class System:
    """Facade. For image input, SuperPoint weights are taken from
    `sp_params` (random-init if None — fine for synthetic-feature tests; real
    runs should load converted public weights)."""

    def __init__(self, cam: _cam.Camera, sensor: Sensor = Sensor.MONOCULAR,
                 caps: Optional[mstate.MapCaps] = None, sp_params=None,
                 n_features: int = 1024, seed: int = 0,
                 enable_mapping: bool = True, max_depth: float = 40.0,
                 local_ba_every: int = 1):
        self.cam = cam
        self.sensor = sensor
        self.caps = caps or mstate.MapCaps()
        mode = {Sensor.MONOCULAR: "mono", Sensor.IMU_MONOCULAR: "mono",
                Sensor.RGBD: "rgbd", Sensor.IMU_RGBD: "rgbd",
                Sensor.STEREO: "stereo", Sensor.IMU_STEREO: "stereo"}[sensor]
        self.tracker = tracking.Tracker(cam, self.caps, sensor=mode,
                                        seed=seed)
        self.sp_params = sp_params
        self.n_features = n_features
        self.enable_mapping = enable_mapping
        self.max_depth = max_depth
        self.local_ba_every = local_ba_every
        self._kf_count = 0

    # -- frame entry points ----------------------------------------------

    def track_monocular(self, img, timestamp: float):
        """Image in, T_cw out (reference: System::TrackMonocular
        src/System.cc:409)."""
        feat = build_frame_mono(self._sp(), img, self.cam, timestamp,
                                n_max=self.n_features)
        return self.track_features(feat)

    def track_rgbd(self, img, depth, timestamp: float,
                   depth_factor: float = 5000.0):
        feat = build_frame_rgbd(self._sp(), img, depth, self.cam, timestamp,
                                depth_factor=depth_factor,
                                n_max=self.n_features)
        return self.track_features(feat)

    def track_features(self, feat: FrameFeatures):
        """Pre-extracted features in (synthetic tests / custom frontends)."""
        state, R, t = self.tracker.track(feat)
        if self.tracker.new_kf is not None and self.enable_mapping:
            self._mapping_step(self.tracker.new_kf)
        return state, R, t

    # -- mapping (keyframe-rate) -----------------------------------------

    def _mapping_step(self, kf: int):
        """Reference: LocalMapping pipeline per keyframe
        (src/LocalMapping.cc:85-107)."""
        st = self.tracker.st
        k = jnp.asarray(kf)
        if self.tracker.sensor in ("rgbd", "stereo"):
            st = mapping.create_depth_landmarks(st, self.cam, k,
                                                max_depth=self.max_depth)
        st = mapping.create_new_landmarks(st, self.cam, k)
        st = mapping.fuse_into_neighbors(st, self.cam, k)
        self._kf_count += 1
        if self._kf_count % self.local_ba_every == 0 and self._kf_count > 1:
            st = mapping.local_bundle_adjustment(st, self.cam, k)
        st = mapping.cull_bad_landmarks(st, st.next_kf_counter)
        # refresh tracker's bindings against culled landmarks
        self.tracker.st = st
        lb = self.tracker.last_bind
        if lb is not None:
            alive = jnp.take(st.lm_mask, jnp.maximum(lb, 0)) & (lb >= 0)
            self.tracker.last_bind = jnp.where(alive, lb, -1)

    # -- misc public API --------------------------------------------------

    @property
    def map_state(self) -> mstate.MapState:
        return self.tracker.st

    def n_keyframes(self) -> int:
        return int(mstate.num_keyframes(self.tracker.st))

    def n_landmarks(self) -> int:
        return int(mstate.num_landmarks(self.tracker.st))

    def shutdown(self):
        pass

    def save_trajectory_tum(self, path: str):
        """TUM format: time tx ty tz qx qy qz qw of T_wc (reference:
        System::SaveTrajectoryTUM src/System.cc:579)."""
        from dani_slam_tpu.core import lie
        rows = []
        for (tm, R_cw, t_cw) in self.tracker.trajectory:
            R_wc = R_cw.T
            C = -R_wc @ t_cw
            q = np.asarray(lie.mat_to_quat(jnp.asarray(R_wc)))
            rows.append(f"{tm:.6f} {C[0]:.7f} {C[1]:.7f} {C[2]:.7f} "
                        f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")

    def _sp(self):
        if self.sp_params is None:
            import jax
            from dani_slam_tpu.models import superpoint
            self.sp_params = superpoint.init_params(jax.random.PRNGKey(0))
        return self.sp_params
