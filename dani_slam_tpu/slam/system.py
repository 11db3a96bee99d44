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

import jax
import jax.numpy as jnp
import numpy as np

from dani_slam_tpu.core import cameras as _cam
from dani_slam_tpu.core import state as mstate
from dani_slam_tpu.slam import mapping, tracking
from dani_slam_tpu.slam.frame import (FrameFeatures, build_frame_mono,
                                      build_frame_rgbd)
from dani_slam_tpu.utils import verbose


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
    runs should load converted public weights).

    .. warning:: Constructing a System sets the PROCESS-GLOBAL JAX config
       ``jax_default_matmul_precision = "highest"`` and never restores it:
       the f32 SLAM geometry is numerically unsafe under TPU's default
       bf16-pass matmuls (tracking collapses mid-sequence), and the setting
       must cover every jitted program the System dispatches, including ones
       traced lazily long after __init__. Side effect on co-hosted JAX code:
       full-f32 matmul throughput everywhere. Explicitly-cast bf16 matmuls
       (the learned modules here) are unaffected; unrelated code that wants
       fast passes back can scope them with
       ``jax.default_matmul_precision('default')``."""

    def __init__(self, cam: _cam.Camera, sensor: Sensor = Sensor.MONOCULAR,
                 caps: Optional[mstate.MapCaps] = None, sp_params=None,
                 n_features: int = 1024, seed: int = 0,
                 enable_mapping: bool = True, max_depth: float = 40.0,
                 local_ba_every: int = 1, enable_loop_closing: bool = True,
                 enable_relocalization: bool = True,
                 pipelined: bool = False, detector=None, matcher="auto",
                 imu_calib=None, n_levels: int = 1,
                 scale_factor: float = 1.2,
                 close_depth: float | None = None):
        # TPU default matmul precision is bfloat16 passes — fine for the
        # nets (they cast to bf16 explicitly) but FATAL for the f32 SLAM
        # geometry: pose solves/triangulation degrade until tracking dies
        # (verified on-device: tracking collapses mid-sequence at default
        # precision, runs clean at "highest"). Explicitly-cast bf16 model
        # matmuls are unaffected by this setting.
        jax.config.update("jax_default_matmul_precision", "highest")
        self.cam = cam
        self.sensor = sensor
        self.caps = caps or mstate.MapCaps()
        mode = {Sensor.MONOCULAR: "mono", Sensor.IMU_MONOCULAR: "mono",
                Sensor.RGBD: "rgbd", Sensor.IMU_RGBD: "rgbd",
                Sensor.STEREO: "stereo", Sensor.IMU_STEREO: "stereo"}[sensor]
        self.tracker = tracking.Tracker(cam, self.caps, sensor=mode,
                                        seed=seed, pipelined=pipelined)
        self.sp_params = sp_params
        self.n_features = n_features
        # multi-level pyramid (reference mono configs run nLevels=8,
        # Examples/Monocular/TUM1.yaml:43; RGB-D runs 1, TUM3.yaml:48) —
        # octaves feed invSigma2 weighting and octave-scaled search radii
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.enable_mapping = enable_mapping
        self.max_depth = max_depth
        self.local_ba_every = local_ba_every
        # fuse/cull maintenance cadence (1 = reference behavior: every KF;
        # 2 halves the average keyframe-program device time)
        self.aux_every = 2
        # sensor-aware keyframe-culling policy (reference:
        # KeyFrameCulling thresholds, src/LocalMapping.cc:914-920):
        # 0.5 redundancy for stereo/RGB-D-inertial, else 0.9; temporal
        # guards for any inertial map; close-point-only counting when the
        # settings provide a close/far depth threshold (mThDepth analogue —
        # Settings.baseline * Settings.th_depth; None disables the gate,
        # e.g. synthetic feature-level tests with no metric depth scale)
        imu_sensor = sensor in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO,
                                Sensor.IMU_RGBD)
        self.cull_redundancy = 0.5 if (imu_sensor and mode != "mono") else 0.9
        self.cull_inertial = imu_sensor
        # 4 kills per aux pass (aux_every=2 -> 2 kills per inserted KF):
        # culling capacity must EXCEED the insertion rate or a revisit
        # backlog never drains (round-4 red test: sustained orbits grew the
        # map linearly at max_kills=2 — exactly 1 kill per inserted KF, zero
        # headroom; the reference erases every redundant KF per pass,
        # src/LocalMapping.cc:904)
        self.cull_max_kills = 4
        self.close_depth = close_depth
        # covisible-of-covisible fuse targets (reference SearchInNeighbors
        # second-hop extension, src/LocalMapping.cc:735-748): up to this
        # many extra targets per one-hop neighbor, riding the aux cadence
        self.fuse_two_hop = 4
        # LBA iteration budget (reference first phase: 5 iterations,
        # src/Optimizer.cc:1350-1365) and its under-pressure truncation
        self.ba_iters = 5
        self.ba_iters_pressure = 3
        self._kf_count = 0
        # deferred keyframe host pulls (overlap the keyframe program with
        # subsequent frames' host work; see _keyframe_step/_resolve_kf_pull)
        self._kf_pulls = []
        self._last_kf_fid = -10 ** 9
        self.kf_pull_depth = 4
        self.deferred_kf = True
        # timestamp-jump guard (reference: src/Tracking.cc:1839-1875)
        self._last_ts = None
        self.max_time_jump = 1.0
        # fused image-path constants (staged once; per-frame uploads through
        # a remote transport are expensive)
        self._frame_consts = None
        self._scalar_cache = {}
        self.sp_threshold = 0.007
        self.loop_closer = None
        # the LoopCloser owns the place-recognition database, which
        # relocalization also needs — create it for either feature and gate
        # loop DETECTION separately (round-1 review: reloc with loop closing
        # disabled was silently a no-op)
        if enable_loop_closing or enable_relocalization:
            from dani_slam_tpu.slam.loopclosing import LoopCloser
            self.loop_closer = LoopCloser(
                cam, self.caps, seed=seed,
                fix_scale=mode in ("rgbd", "stereo"))
            self.loop_closer.detect_loops = enable_loop_closing
        if enable_relocalization:
            self.tracker.reloc_fn = self._relocalize
        self._reloc_key = jax.random.PRNGKey(seed + 1)
        # dynamic-object masking (reference: YOLO runs on the RGB-D path
        # only, src/Tracking.cc:1534-1546)
        self.detector = detector
        # learned matcher (models/lightglue.MatcherState) — the reference's
        # PRIMARY matcher for SearchByBoW / SearchForTriangulation
        # (src/LGmatcher.cpp:314,983) plus relocalization and stereo
        # matching. "auto" loads the shipped trained weights when the map's
        # descriptor dim matches (synthetic-feature tests run D=64 and keep
        # the descriptor-NN path).
        if matcher == "auto":
            matcher = None
            if self.caps.D == 256:
                from dani_slam_tpu.models import lightglue as lg
                matcher = lg.load_default_matcher(cam.width, cam.height)
        self.matcher = matcher
        self.tracker.matcher = matcher
        # resolve deferred keyframe pulls right before any keyframe decision
        # (the decision needs the host-side ref_kf_tracked count)
        self.tracker.pre_kf_decision = (
            lambda: self._resolve_kf_pull(force=False))
        # multi-map Atlas (reference: src/Atlas.cc; new map on unrecoverable
        # loss, Tracking::CreateMapInAtlas src/Tracking.cc:2682)
        from dani_slam_tpu.slam.atlas import Atlas
        self.atlas = Atlas(self.caps)
        self.lost_frames_before_new_map = 30
        self.min_kfs_to_stash = 5
        # inertial pipeline for IMU_* sensors (reference: IMU preintegration
        # between frames + InitializeIMU staging, src/Tracking.cc:1643,
        # src/LocalMapping.cc:1175)
        self.use_imu = sensor in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO,
                                  Sensor.IMU_RGBD)
        if self.use_imu:
            from dani_slam_tpu.slam.inertial import InertialState
            self.tracker.inertial = InertialState(imu_calib)
            self._kf_window_marks = []   # (slot, frame_id, window idx) / KF
            self._recent_kfs = []        # temporal KF chain (slot, fid)
            self._recent_preints = []    # KF-to-KF preintegrations
            self.vi_window = 10          # Nd (reference Nd=10)
            # bLarge variant: strong tracking widens the temporal window
            # and shortens the LM budget (reference: 25 KFs x 4 iters when
            # GetMatchesInliers()>75, src/Optimizer.cc:2387-2392 +
            # src/LocalMapping.cc:150-151)
            self.vi_window_large = 25
            self.vi_large_tracked = 75
            # staged whole-map VI refinement (reference: VIBA1 at
            # mTinit>5s, VIBA2 at >15s, src/LocalMapping.cc:204-233)
            self._viba_stage = -1        # -1: not init; 0/1/2: stages done
            self._t_imu_init = None
            self._frame_marks = {}       # frame_id -> window count

    # -- frame entry points ----------------------------------------------

    def track_monocular(self, img, timestamp: float):
        """Image in, T_cw out (reference: System::TrackMonocular
        src/System.cc:409)."""
        feat = build_frame_mono(self._sp(), img, self.cam, timestamp,
                                n_max=self.n_features,
                                threshold=self.sp_threshold,
                                n_levels=self.n_levels,
                                scale_factor=self.scale_factor)
        return self.track_features(feat, timestamp=timestamp)

    def track_rgbd(self, img, depth, timestamp: float,
                   depth_factor: float = 5000.0, time_dev=None):
        """RGB-D image pair in, T_cw out. On the steady-state (OK) path the
        whole frame — detector, frontend, tracking, velocity, ref-pose — is
        ONE device program (tracking.rgbd_frame_fused); init/lost/inertial
        frames fall back to the staged path inside track_image_rgbd.
        time_dev: optional pre-staged device scalar of `timestamp` (avoids
        a per-frame host->device upload through remote transports)."""
        tr = self.tracker
        tr.sp_params = self._sp()
        # timestamp-jump detection (as in track_features)
        if self._last_ts is not None and (
                timestamp > self._last_ts + self.max_time_jump or
                timestamp < self._last_ts):
            if tr.state != tracking.NOT_INITIALIZED:
                self._resolve_kf_pull()
                self._new_map_in_atlas()
        self._last_ts = timestamp
        if self.use_imu:
            # the image fused path doesn't carry IMU; route through the
            # feature path for inertial sensors
            boxes = box_mask = None
            dyn_ratio = None
            if self.detector is not None:
                boxes, box_mask, dyn_ratio = \
                    self.detector.dynamic_mask_inputs(img)
            feat = build_frame_rgbd(self._sp(), img, depth, self.cam,
                                    timestamp, depth_factor=depth_factor,
                                    n_max=self.n_features, boxes=boxes,
                                    box_mask=box_mask)
            return self.track_features(feat, dyn_ratio=dyn_ratio,
                                       timestamp=timestamp)
        if self._frame_consts is None:
            self._frame_consts = (
                jax.device_put(jnp.zeros((1, 4), jnp.float32)),
                jax.device_put(jnp.zeros((1,), bool)))
        def staged(name, v):
            key = (name, float(v))
            if key not in self._scalar_cache:
                self._scalar_cache[key] = jax.device_put(
                    jnp.asarray(v, jnp.float32))
            return self._scalar_cache[key]

        state, R, t = tr.track_image_rgbd(
            img, depth,
            time_dev if time_dev is not None
            else jnp.asarray(timestamp, jnp.float32),
            staged("df", depth_factor), staged("th", self.sp_threshold),
            self._frame_consts, detector=self.detector,
            n_max=self.n_features)
        if tr.pending_kf is not None and self.enable_mapping:
            self._resolve_kf_pull(force=False)
            self._keyframe_step()
        if state == tracking.LOST and \
                tr.frames_lost > self.lost_frames_before_new_map:
            self._new_map_in_atlas()
        return state, R, t

    def track_stereo(self, img_left, img_right, timestamp: float,
                     baseline: float, imu_window=None):
        """Rectified stereo pair in, T_cw out (reference: System::TrackStereo
        src/System.cc:254; unrectified input should be remapped first with
        ops/rectify grids, as the EuRoC runner does)."""
        from dani_slam_tpu.slam.frame import build_frame_stereo
        feat = build_frame_stereo(self._sp(), img_left, img_right, self.cam,
                                  baseline, timestamp,
                                  n_max=self.n_features,
                                  matcher=self.matcher)
        return self.track_features(feat, imu_window=imu_window,
                                   timestamp=timestamp)

    def track_features(self, feat: FrameFeatures, dyn_ratio=None,
                       imu_window=None, timestamp: float | None = None):
        """Pre-extracted features in (synthetic tests / custom frontends).
        dyn_ratio: device scalar in [0,1] — fraction of the image covered by
        dynamic objects (keyframe veto above 0.8, src/Tracking.cc:3273).
        imu_window: slam.inertial.ImuWindow of samples since the previous
        frame (IMU_* sensors). timestamp: host-side frame time (float) for
        the timestamp-jump guard — image entry points pass it automatically;
        feature callers may omit it (no device pull is ever made for it).

        NB: any pending keyframe host-pull is resolved lazily at the NEXT
        keyframe decision (tracker.pre_kf_decision hook), so the keyframe
        program overlaps this frame's frontend+track dispatches."""
        # timestamp-jump detection (reference: src/Tracking.cc:1839-1875 —
        # a gap >1 s or a backwards step means the stream was cut; the IMU
        # chain is broken, so stash the map and start a fresh one)
        if timestamp is not None:
            if self._last_ts is not None and (
                    timestamp > self._last_ts + self.max_time_jump or
                    timestamp < self._last_ts):
                if self.tracker.state != tracking.NOT_INITIALIZED:
                    self._resolve_kf_pull()
                    self._new_map_in_atlas()
            self._last_ts = timestamp
        if self.use_imu and imu_window is not None:
            self.tracker.inertial.integrate_frame(imu_window)
        if self.use_imu:
            # per-frame window count, so init keyframes (created inside the
            # tracker, not via the keyframe step) can be back-annotated with
            # their chain marks
            self._frame_marks[self.tracker.frame_id] = len(
                self.tracker.inertial.frame_windows)
            while len(self._frame_marks) > 30:
                self._frame_marks.pop(next(iter(self._frame_marks)))
        self.tracker.dynamic_ratio = dyn_ratio
        state, R, t = self.tracker.track(feat)
        if self.use_imu and self.tracker.init_kfs:
            for (slot, fid) in self.tracker.init_kfs:
                self._kf_window_marks.append(
                    (slot, fid, self._frame_marks.get(fid, 0)))
            self.tracker.init_kfs = None
        if (self.tracker.pending_kf is not None and self.enable_mapping):
            self._resolve_kf_pull(force=False)   # pull queue stays bounded
            self._keyframe_step()
        if state == tracking.LOST and \
                self.tracker.frames_lost > self.lost_frames_before_new_map:
            self._new_map_in_atlas()
        return state, R, t

    def _new_map_in_atlas(self):
        """Unrecoverable loss: stash the current map (if substantial) and
        start a fresh one (reference: CreateMapInAtlas src/Tracking.cc:2682;
        active-map reset when <10 KFs, src/Tracking.cc:2287-2306)."""
        self._resolve_kf_pull()   # stale pulls reference the OLD map
        tr = self.tracker
        verbose.print_mess(
            f"Atlas: unrecoverable loss at frame {tr.frame_id} — starting a "
            f"new map ({self.n_keyframes()} KFs in the old one)")
        if self.n_keyframes() >= self.min_kfs_to_stash:
            bow = self.loop_closer.bow if self.loop_closer else None
            self.atlas.stash(tr.st, bow=bow)
        frame_id = tr.frame_id
        tr.reset()
        tr.frame_id = frame_id
        self._last_ts = None
        if self.loop_closer is not None:
            self.loop_closer.bow = jnp.zeros_like(self.loop_closer.bow)
            self.loop_closer.last_loop_kf = -10 ** 9
            self.loop_closer._pending_cand = None
            self.loop_closer._hyp = None
            self.loop_closer._pending_verify = None
            self.loop_closer.abort_gba()   # snapshot references the old map
        self._kf_count = 0
        if self.use_imu:
            self._kf_window_marks = []
            self._recent_kfs = []
            self._recent_preints = []
            self._viba_stage = -1
            self._t_imu_init = None
            self._frame_marks = {}

    # -- mapping (keyframe-rate) -----------------------------------------

    def _keyframe_step(self):
        """Fused insert+mapping program (reference: the whole LocalMapping
        pipeline per keyframe, src/LocalMapping.cc:85-107). One dispatch,
        one small host pull. Stale bindings to culled landmarks are benign —
        every tracking step masks them against lm_mask."""
        tr = self.tracker
        feat, bind, R_kf, t_kf = tr.pending_kf
        tr.pending_kf = None
        self._kf_count += 1
        fid = tr.frame_id - 1
        imu_ready = (self.use_imu and self.tracker.inertial is not None
                     and self.tracker.inertial.initialized)
        do_ba = (self._kf_count % self.local_ba_every == 0
                 and self._kf_count > 1 and not imu_ready)
        mm = self.matcher
        # fuse/cull maintenance alternates across keyframes (idempotent
        # catch-up passes; see mapping.keyframe_step do_aux)
        do_aux = (self._kf_count % self.aux_every == 0
                  or self._kf_count <= 2)
        # the covisible-of-covisible fuse extension runs on every OTHER aux
        # pass: it is the costliest maintenance slice (measured ~+15 ms per
        # keyframe program at production caps) and, like the rest of the
        # aux passes, an idempotent catch-up — the reference likewise skips
        # SearchInNeighbors entirely when the keyframe queue backs up
        # (src/LocalMapping.cc:85-107)
        two_hop = (self.fuse_two_hop
                   if (self._kf_count % (2 * self.aux_every) == 0
                       or self._kf_count <= 2) else 0)
        # LBA truncation under keyframe pressure (reference: Tracking calls
        # InterruptBA when it wants a keyframe and LBA aborts mid-iteration,
        # src/Tracking.cc:3265 + mbAbortBA polling in LocalBundleAdjustment;
        # under rapid insertion the reference effectively runs FEWER LM
        # iterations). Back-to-back keyframes here truncate the budget; the
        # window re-solves at every keyframe, so truncation self-corrects.
        ba_iters = (self.ba_iters_pressure
                    if (fid - self._last_kf_fid) <= 4 else self.ba_iters)
        self._last_kf_fid = fid
        st, k, n_tracked, chain = mapping.keyframe_step(
            tr.st, self.cam, feat.xy, feat.valid, feat.desc, feat.depth,
            bind, R_kf, t_kf, feat.time, jnp.asarray(fid),
            use_depth=tr.sensor in ("rgbd", "stereo"), do_ba=do_ba,
            do_aux=do_aux,
            max_depth=self.max_depth, feat_octave=feat.octave_or_zeros(),
            matcher_model=mm.model if mm is not None else None,
            matcher_params=mm.params if mm is not None else None,
            chain=(tr.R, tr.t, tr.R_last, tr.t_last), ba_iters=ba_iters,
            cull_redundancy=self.cull_redundancy,
            cull_inertial=self.cull_inertial,
            cull_max_kills=self.cull_max_kills,
            cull_close_only=self.close_depth is not None,
            cull_close_depth=(self.close_depth
                              if self.close_depth is not None else 3.0),
            fuse_two_hop=two_hop)
        tr.st = st
        tr.ref_kf_dev = k.astype(jnp.int32)   # stays on device for tracking
        # re-anchor the tracker's pose chain onto the BA-refined keyframe
        # (reference: src/Tracking.cc:1909-1915) — computed inside the
        # keyframe program; all device-side, no pull, no extra dispatch
        tr.R, tr.t, tr.R_last, tr.t_last, cR, ct = chain
        self._correct_pending_chain(cR, ct)
        # Defer the host pull of (slot, n_tracked) by kf_pull_depth frames:
        # an immediate device_get stalls the host for the whole keyframe
        # program (plus one transport RTT) while the device then sits idle
        # waiting for the next frame's upload. The tracker keeps tracking
        # against ref_kf_dev (device scalar) and the trajectory records the
        # device slot, so nothing downstream needs the host values until the
        # loop-closer hooks run at resolve time. (The reference's analogue
        # is the Tracking/LocalMapping thread handoff —
        # LocalMapping::InsertKeyFrame returns immediately,
        # src/LocalMapping.cc:273-278.)
        tr.ref_kf_fid = fid           # host-known at dispatch
        for a in (k, n_tracked):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        self._kf_pulls.append((k, n_tracked, fid, self._kf_count,
                               tr.frame_id))
        if self.use_imu or self.atlas.n_maps() > 0 or not self.deferred_kf:
            self._resolve_kf_pull()   # inertial/merge paths need host ids now
        if self.use_imu:
            # record (slot, frame_id, frame-window index) at insertion time:
            # the frame id disambiguates reused slots, the window index
            # aligns preintegration spans with THIS keyframe chain (round-1
            # advisor: occupied-slot order drifts once any KF is culled)
            self._kf_window_marks.append(
                (tr.ref_kf, fid, len(tr.inertial.frame_windows)))
            self._maybe_initialize_imu()
            self._record_kf_preint()
            if self.tracker.inertial.initialized:
                self._run_local_inertial_ba()

    def _correct_pending_chain(self, cR, ct):
        """Apply a map-frame pose correction to the in-flight pipeline:
        pending rollback snapshots + deferred keyframe poses must receive
        the same correction as the tracker chain, or a rollback would undo
        a re-anchoring (keyframe-BA chain correction or GBA weld-back)."""
        tr = self.tracker
        if tr._pending:
            fixed = []
            for (counts, pfeat, pbind, fpose, snap) in tr._pending:
                fR, ft = tracking.apply_chain_correction(fpose[0], fpose[1],
                                                         cR, ct)
                (sR, st_, sRl, stl, svel, sst, slb, slf, sltime,
                 sinert) = snap
                sR, st_ = tracking.apply_chain_correction(sR, st_, cR, ct)
                sRl, stl = tracking.apply_chain_correction(sRl, stl, cR, ct)
                fixed.append((counts, pfeat, pbind, (fR, ft),
                              (sR, st_, sRl, stl, svel, sst, slb, slf,
                               sltime, sinert)))
            tr._pending = fixed

    def _resolve_kf_pull(self, force: bool = True):
        """Pull deferred keyframe ids and run the keyframe-rate hooks that
        need host values (BoW/loop closing, map merge).

        Non-forced calls (the per-frame keyframe-decision hook) only resolve
        pulls whose async transfers have had kf_pull_depth frames of head
        start — by then the keyframe program has drained from the device
        queue and the pull returns without stalling the host (the old
        immediate device_get blocked the frame AFTER every keyframe for the
        whole keyframe program, the dominant per-KF host stall). Forced
        calls (merge/inertial/reset/shutdown paths) drain everything."""
        tr = self.tracker
        while self._kf_pulls:
            k, n_tracked, fid, kf_count, disp_fid = self._kf_pulls[0]
            if not force and tr.frame_id - disp_fid <= self.kf_pull_depth:
                break
            self._kf_pulls.pop(0)
            k_host, n_host = jax.device_get((k, n_tracked))
            # only the NEWEST pull updates the reference bookkeeping: with
            # back-to-back keyframes, an older pull resolving late must not
            # overwrite ref_kf/ref_kf_tracked that already refer to a newer
            # keyframe (the decision-time hint keeps them current meanwhile)
            if kf_count == self._kf_count:
                tr.ref_kf = int(k_host)
                tr.ref_kf_tracked = int(n_host)
            if self.loop_closer is not None:
                tr.st = self.loop_closer.on_keyframe(
                    tr.st, int(k_host), kf_count=kf_count, kf_dev=k,
                    chain_ref=tr.ref_kf_dev)
                if self.loop_closer.chain_corr is not None:
                    # GBA weld-back moved the map under the tracker: apply
                    # the reference-KF correction to the live pose chain
                    cR, ct = self.loop_closer.chain_corr
                    tr.R, tr.t = tracking.apply_chain_correction(
                        tr.R, tr.t, cR, ct)
                    tr.R_last, tr.t_last = tracking.apply_chain_correction(
                        tr.R_last, tr.t_last, cR, ct)
                    self._correct_pending_chain(cR, ct)
                    # a keyframe awaiting its mapping step must be inserted
                    # at the POST-weld pose
                    if tr.pending_kf is not None:
                        pfeat, pbind, pR, pt = tr.pending_kf
                        pR, pt = tracking.apply_chain_correction(pR, pt,
                                                                 cR, ct)
                        tr.pending_kf = (pfeat, pbind, pR, pt)
                    # the frame pose popped by the in-flight keyframe
                    # DECISION (tracking._resolve_pending) was captured
                    # before this weld — hand it the correction
                    tr.pending_chain_corr = (cR, ct)
                    self.loop_closer.chain_corr = None
            if self.atlas.n_maps() > 0:
                self._try_map_merge()

    def _record_kf_preint(self):
        """Preintegrate the window since the previous keyframe and track the
        temporal KF chain for LocalInertialBA."""
        tr = self.tracker
        marks = self._kf_window_marks
        if len(marks) >= 2:
            bounds = [(marks[-2][2], marks[-1][2])]
            pre = tr.inertial.kf_chain_preintegrations(bounds)[0]
        else:
            pre = None
        self._recent_kfs.append((marks[-1][0], marks[-1][1]))
        self._recent_preints.append(pre)
        buf = max(self.vi_window, self.vi_window_large)
        if len(self._recent_kfs) > buf:
            self._recent_kfs.pop(0)
            self._recent_preints.pop(0)

    def _refine_imu_scale(self):
        """Re-estimate scale/gravity over the recent keyframe chain and
        re-apply to the map (mono scale drift correction)."""
        from dani_slam_tpu.slam import inertial as inert
        tr = self.tracker
        # use the RECORDED (slot, preintegration) chain, and only its
        # CONTIGUOUS trailing run of still-alive keyframes — dropping a
        # culled middle member would pair preintegrations with the wrong
        # keyframe spans. A slot counts as alive only if it still holds the
        # SAME keyframe (frame id match — slots are reused after culling).
        kf_mask = np.asarray(tr.st.kf_mask)
        kf_fid = np.asarray(tr.st.kf_frame_id)
        chain = []
        for (k, fid), p in zip(reversed(self._recent_kfs),
                               reversed(self._recent_preints)):
            if not (kf_mask[k] and kf_fid[k] == fid) or (chain and p is None):
                break
            chain.append((k, p))
            if len(chain) > self.vi_window:
                break
        chain.reverse()
        if len(chain) < 4:
            return
        kf_ids = [k for k, _ in chain]
        preints = [p for _, p in chain][1:]
        if any(p is None for p in preints):
            return
        was_init = tr.inertial.initialized
        st2, ok = inert.initialize_imu(tr.st, tr.inertial, kf_ids, preints,
                                       mono_scale_free=True)
        if ok:
            tr.st = st2
            Rg, s_scl = tr.inertial.last_alignment
            for attr_R, attr_t in (("R", "t"), ("R_last", "t_last")):
                setattr(tr, attr_R, getattr(tr, attr_R) @ Rg.T)
                setattr(tr, attr_t, s_scl * getattr(tr, attr_t))
            if tr.vel is not None:
                Rv, tv = tr.vel
                tr.vel = (Rv, s_scl * tv)
        tr.inertial.initialized = was_init or ok

    def _run_local_inertial_ba(self):
        """Temporal-window VI BA (reference: LocalInertialBA replaces the
        visual local BA once the IMU is initialized,
        src/LocalMapping.cc:150-151)."""
        from dani_slam_tpu.slam import inertial_mapping
        import jax.tree_util as jtu
        tr = self.tracker
        # bLarge only once a FULL large window exists: on short maps a
        # 25-slot window covers everything including the init keyframes,
        # and the reduced iteration budget loses metric scale (the
        # reference's bLarge maps are hundreds of KFs deep)
        large = (tr.ref_kf_tracked > self.vi_large_tracked and
                 len(self._recent_kfs) >= self.vi_window_large)
        P = self.vi_window_large if large else self.vi_window
        iters = 4 if large else 6
        slots = [k for k, _fid in self._recent_kfs[-P:]]
        pres = self._recent_preints[-P:]
        if len(slots) < 3:
            return
        # pad to fixed window size
        pad = P - len(slots)
        slot_arr = jnp.asarray([slots[0]] * pad + slots, jnp.int32)
        valid = jnp.asarray([False] * pad + [True] * len(slots))
        pre_list = []
        edge_ok = []
        from dani_slam_tpu.ops import imu as imu_ops
        ident = imu_ops.identity_preintegration()
        for p in ([None] * pad + pres)[1:]:
            pre_list.append(p if p is not None else ident)
            edge_ok.append(p is not None)
        stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *pre_list)
        tr.st = inertial_mapping.local_inertial_ba(
            tr.st, self.cam, slot_arr, valid, stacked,
            jnp.asarray(edge_ok), tr.inertial.calib, iters=iters)

    def _maybe_initialize_imu(self):
        """Run gravity/scale init once enough keyframes + time accumulated
        (reference: IMU init trigger, src/LocalMapping.cc:183-189), then a
        periodic scale refinement for monocular maps (reference:
        ScaleRefinement at 25/35s, src/LocalMapping.cc:236-248 — mono
        triangulation drifts the metric scale between inertial solves)."""
        from dani_slam_tpu.slam import inertial as inert
        tr = self.tracker
        if tr.inertial.initialized:
            # staged whole-map refinement after init (reference timers:
            # VIBA1 at mTinit>5s with priors (1,1e5), VIBA2 at >15s with
            # (0,0), src/LocalMapping.cc:204-233)
            now = float(tr.st.kf_time[tr.ref_kf])
            elapsed = now - (self._t_imu_init or now)
            import dataclasses as _dc
            if self._viba_stage == 0 and elapsed > 5.0:
                self._run_full_inertial_ba(1.0, 1e5)
                tr.st = _dc.replace(tr.st, imu_ba1=jnp.ones((), bool))
                self._viba_stage = 1
            elif self._viba_stage == 1 and elapsed > 15.0:
                self._run_full_inertial_ba(0.0, 0.0)
                tr.st = _dc.replace(tr.st, imu_ba2=jnp.ones((), bool))
                self._viba_stage = 2
            if (tr.sensor == "mono" and
                    len(self._kf_window_marks) % 3 == 0):
                self._refine_imu_scale()
                # mono triangulation drifts scale SEGMENT-wise; a global
                # rescale alone shifts the error to older segments. The
                # whole-chain VI BA redistributes it (the reference leans on
                # LocalInertialBA + the 5s/15s FullInertialBA stages; at TPU
                # cost a periodic full pass is cheap insurance)
                if len(self._kf_window_marks) % 9 == 0:
                    self._run_full_inertial_ba(1.0, 1e5, iters=6)
            return
        if len(self._kf_window_marks) < 5:
            return
        # chain of marks whose keyframes are still alive: slot occupied AND
        # holding the same frame id (slots are reused, so a mask check alone
        # can pair a preintegration with a different keyframe). Window
        # bounds between consecutive ALIVE marks remain correct across
        # culled keyframes — the samples of the culled span merge into one
        # preintegration (reference: Preintegrated::MergePrevious on KF
        # culling, src/LocalMapping.cc:904). len(kf_ids)==len(preints)+1 by
        # construction.
        run = self._alive_chain()
        if len(run) < 5:
            return
        bounds = [(a[2], b[2]) for a, b in zip(run[:-1], run[1:])]
        preints = tr.inertial.kf_chain_preintegrations(bounds)
        kf_ids = [slot for slot, _, _ in run]
        assert len(kf_ids) == len(preints) + 1
        mono = tr.sensor == "mono"
        st2, ok = inert.initialize_imu(tr.st, tr.inertial, kf_ids, preints,
                                       mono_scale_free=mono)
        if ok:
            import dataclasses as _dc
            tr.st = _dc.replace(st2, imu_initialized=jnp.ones((), bool))
            # the tracker's current pose lives in the OLD world frame —
            # apply the same gravity-rotation/scale the map received
            # (reference: ApplyScaledRotation also rewrites mCurrentFrame &
            # velocity, src/Map.cc + Tracking::UpdateFrameIMU)
            Rg, s_scl = tr.inertial.last_alignment
            for attr_R, attr_t in (("R", "t"), ("R_last", "t_last")):
                Rk = getattr(tr, attr_R) @ Rg.T
                tk = s_scl * getattr(tr, attr_t)
                setattr(tr, attr_R, Rk)
                setattr(tr, attr_t, tk)
            if tr.vel is not None:
                Rv, tv = tr.vel
                tr.vel = (Rv, s_scl * tv)
            # stage 0: FullInertialBA with the strong init priors
            # (reference: InitializeIMU -> FullInertialBA(100, 1e10),
            # src/LocalMapping.cc:1270-1320)
            self._t_imu_init = float(tr.st.kf_time[kf_ids[-1]])
            self._viba_stage = 0
            self._run_full_inertial_ba(1e2, 1e10)

    def _alive_chain(self):
        """All recorded keyframe marks whose slot still holds the same
        keyframe (frame-id match defends against slot reuse), in temporal
        order."""
        tr = self.tracker
        kf_mask = np.asarray(tr.st.kf_mask)
        kf_fid = np.asarray(tr.st.kf_frame_id)
        return [(s, f, m) for (s, f, m) in self._kf_window_marks
                if kf_mask[s] and kf_fid[s] == f]

    def _run_full_inertial_ba(self, prior_g: float, prior_a: float,
                              iters: int = 8):
        """Whole-map VI BA over the alive keyframe chain; corrects the
        tracker's current pose by the newest keyframe's update (reference:
        the GBA/FullInertialBA results propagate to the current frame via
        UpdateFrameIMU / spanning-tree propagation)."""
        from dani_slam_tpu.core import lie
        from dani_slam_tpu.ops import imu as imu_ops
        from dani_slam_tpu.slam import inertial_mapping
        import jax.tree_util as jtu
        tr = self.tracker
        chain = self._alive_chain()
        if len(chain) < 4:
            return
        bounds = [(a[2], b[2]) for a, b in zip(chain[:-1], chain[1:])]
        preints = tr.inertial.kf_chain_preintegrations(bounds)
        slots = [s for s, _, _ in chain]
        # pad to a power-of-two ladder size (bounds jit variants)
        P_pad = 8
        while P_pad < len(slots):
            P_pad *= 2
        P_pad = min(P_pad, self.caps.K)
        if len(slots) > P_pad:          # chain exceeds capacity ladder
            drop = len(slots) - P_pad
            slots = slots[drop:]
            preints = preints[drop:]
        pad = P_pad - len(slots)
        slot_arr = jnp.asarray([slots[0]] * pad + slots, jnp.int32)
        valid = jnp.asarray([False] * pad + [True] * len(slots))
        ident = imu_ops.identity_preintegration()
        pre_list, edge_ok = [], []
        for p in ([None] * pad + preints):
            pre_list.append(p if p is not None else ident)
            edge_ok.append(p is not None)
        stacked = jtu.tree_map(lambda *xs: jnp.stack(xs), *pre_list)
        k_new = slots[-1]
        R_old, t_old = tr.st.kf_R[k_new], tr.st.kf_t[k_new]
        tr.st = inertial_mapping.full_inertial_ba_map(
            tr.st, self.cam, slot_arr, valid, stacked,
            jnp.asarray(edge_ok), tr.inertial.calib,
            prior_g=prior_g, prior_a=prior_a, iters=iters)
        # carry the newest KF's correction onto the tracker state so the
        # next frame tracks against the refined map consistently
        R_new, t_new = tr.st.kf_R[k_new], tr.st.kf_t[k_new]
        R_rel, t_rel = lie.se3_mul(tr.R, tr.t, *lie.se3_inv(R_old, t_old))
        tr.R, tr.t = lie.se3_mul(R_rel, t_rel, R_new, t_new)
        Rl_rel, tl_rel = lie.se3_mul(tr.R_last, tr.t_last,
                                     *lie.se3_inv(R_old, t_old))
        tr.R_last, tr.t_last = lie.se3_mul(Rl_rel, tl_rel, R_new, t_new)
        tr.inertial.v_w = tr.st.kf_vel[k_new]
        tr.inertial.bias_g = tr.st.kf_bias_g[k_new]
        tr.inertial.bias_a = tr.st.kf_bias_a[k_new]

    def _try_map_merge(self):
        """Weld the active map into a stored one when place recognition
        finds the overlap (reference: LoopClosing merge branch
        src/LoopClosing.cc:133-190 -> MergeLocal)."""
        from dani_slam_tpu.slam import loopclosing as lc
        tr = self.tracker
        qbow = (self.loop_closer.bow[tr.ref_kf]
                if self.loop_closer is not None else None)
        self._reloc_key, sub = jax.random.split(self._reloc_key)
        fix_scale = tr.sensor in ("rgbd", "stereo")

        imu_on = self.use_imu and bool(tr.st.imu_initialized)
        imu_ba1 = imu_on and bool(tr.st.imu_ba1)

        def verify(st_a, st_b, kf_a, kf_b, key):
            T12, n, ok = lc.verify_cross_map_candidate(
                st_a, st_b, self.cam, kf_a, kf_b, key, fix_scale=fix_scale)
            # inertial merge gates (reference: src/LoopClosing.cc:145-178):
            # reject scale outside [0.9, 1.1]; after VIBA1, clamp the
            # relative rotation to yaw-only (gravity is shared)
            if imu_on and bool(ok):
                R12, t12, s12 = T12
                if not (0.90 < float(s12) < 1.1):
                    return T12, n, jnp.zeros((), bool)
                if imu_ba1:
                    from dani_slam_tpu.core import lie
                    phi = np.asarray(lie.so3_log(R12))
                    R_yaw = lie.so3_exp(
                        jnp.asarray([0.0, 0.0, float(phi[2])]))
                    T12 = (R_yaw, t12, jnp.ones(()))
            return T12, n, ok

        out = self.atlas.try_merge(tr.st, self.cam, tr.ref_kf, qbow, sub,
                                   verify)
        if out is None:
            return
        merged, new_ref = out["st"], out["new_active_kf"]
        kf_map, lm_map = out["kf_map"], out["lm_map"]
        cand_kf = out["cand_kf"]
        if self.loop_closer is not None:
            self.loop_closer.abort_gba()   # snapshot pre-dates the merge
            # the merge remaps every active-map slot: a loop hypothesis or
            # deferred BoW candidate holding pre-merge slots would read the
            # wrong keyframes of the merged map
            self.loop_closer._hyp = None
            self.loop_closer._pending_cand = None
            self.loop_closer._pending_verify = None
        verbose.print_mess("Atlas: merged active map into a stored map")
        tr.st = merged
        tr.ref_kf = new_ref
        tr.ref_kf_fid = int(tr.st.kf_frame_id[new_ref])
        tr.ref_kf_dev = jnp.asarray(new_ref, jnp.int32)
        # remap frame bindings into merged landmark ids
        if tr.last_bind is not None:
            lb = tr.last_bind
            tr.last_bind = jnp.where(
                lb >= 0, jnp.take(lm_map, jnp.maximum(lb, 0)), -1)
        # welding (reference: MergeLocal runs SearchAndFuse over the weld
        # window + a welding local BA, src/LoopClosing.cc:1216-1783): merge
        # duplicate landmarks seen from both sides, then refine the weld
        # neighborhood with the old-map observers as fixed anchors
        from dani_slam_tpu.slam import mapping as mapping_mod
        tr.st = lc.search_and_fuse(tr.st, self.cam, jnp.asarray(new_ref),
                                   jnp.asarray(cand_kf))
        tr.st = mapping_mod.local_bundle_adjustment(
            tr.st, self.cam, jnp.asarray(new_ref))
        # inertial maps additionally re-weld velocities/biases over the
        # temporal window (reference: MergeInertialBA
        # src/Optimizer.cc:3948, invoked from MergeLocal2 :1784)
        if (self.use_imu and self.tracker.inertial is not None
                and self.tracker.inertial.initialized):
            self._run_local_inertial_ba()
        # place-recognition database: the stored map's rows live at their
        # original (target) slots — restore them, then scatter the moved
        # active-map rows through kf_map
        if self.loop_closer is not None:
            old_bow = self.loop_closer.bow
            stored_bow = out.get("stored_bow")
            base = (stored_bow if stored_bow is not None
                    else jnp.zeros_like(old_bow))
            src_valid = kf_map >= 0
            self.loop_closer.bow = base.at[
                jnp.where(src_valid, kf_map, 0)].set(
                jnp.where(src_valid[:, None], old_bow,
                          base[jnp.where(src_valid, kf_map, 0)]))
        # inertial bookkeeping follows the moved keyframes to their new slots
        if self.use_imu:
            kf_map_np = np.asarray(kf_map)
            self._kf_window_marks = [
                (int(kf_map_np[s]), f, m)
                for (s, f, m) in self._kf_window_marks if kf_map_np[s] >= 0]
            kept = [((int(kf_map_np[s]), f), p)
                    for (s, f), p in zip(self._recent_kfs,
                                         self._recent_preints)
                    if kf_map_np[s] >= 0]
            self._recent_kfs = [k for k, _ in kept]
            self._recent_preints = [p for _, p in kept]

    # -- relocalization (reference: Tracking::Relocalization
    #    src/Tracking.cc:3666 — BoW candidates -> PnP RANSAC -> pose opt) --

    def _relocalize(self, tracker, feat: FrameFeatures):
        from dani_slam_tpu.models import vocab as vocab_mod
        from dani_slam_tpu.slam import loopclosing as lc
        if self.loop_closer is None or self.n_keyframes() < 2:
            return None
        self._resolve_kf_pull()   # reloc scores against the full BoW
        codebook = self.loop_closer.codebook
        w = vocab_mod.quantize(feat.desc, feat.valid, codebook)
        qbow = vocab_mod.bow_vector(w, codebook.shape[0])
        idx, vals, keep = vocab_mod.detect_reloc_candidates(
            self.loop_closer.bow, tracker.st.kf_mask, qbow,
            covis=tracker.st.covis, n_best=3)
        for rank in range(3):
            if not bool(keep[rank]):
                continue
            self._reloc_key, sub = jax.random.split(self._reloc_key)
            if self.matcher is not None:
                R, t, bind, n, ok = lc.relocalize_against_kf_lightglue(
                    tracker.st, self.cam, idx[rank], feat.xy, feat.desc,
                    feat.valid, sub, self.matcher)
            else:
                R, t, bind, n, ok = lc.relocalize_against_kf(
                    tracker.st, self.cam, idx[rank], feat.xy, feat.desc,
                    feat.valid, sub)
            if bool(ok):
                return R, t, bind, int(idx[rank])
        return None

    # -- misc public API --------------------------------------------------

    @property
    def map_state(self) -> mstate.MapState:
        return self.tracker.st

    def n_keyframes(self) -> int:
        return int(mstate.num_keyframes(self.tracker.st))

    def n_landmarks(self) -> int:
        return int(mstate.num_landmarks(self.tracker.st))

    def shutdown(self):
        self._resolve_kf_pull()
        self.tracker.flush()
        if (self.tracker.pending_kf is not None and self.enable_mapping):
            self._keyframe_step()
        self._resolve_kf_pull()
        # drain a pending time-sliced correction/GBA so saved maps and
        # trajectories carry the final correction (the reference joins its
        # LoopClosing + GBA threads too)
        if (self.loop_closer is not None and
                (self.loop_closer._gba is not None or
                 self.loop_closer._pgc is not None)):
            tr = self.tracker
            tr.st = self.loop_closer.finish_gba(tr.st, tr.ref_kf_dev)
            if self.loop_closer.chain_corr is not None:
                cR, ct = self.loop_closer.chain_corr
                tr.R, tr.t = tracking.apply_chain_correction(
                    tr.R, tr.t, cR, ct)
                tr.R_last, tr.t_last = tracking.apply_chain_correction(
                    tr.R_last, tr.t_last, cR, ct)
                self.loop_closer.chain_corr = None

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

    def activate_localization_mode(self):
        """Track against the existing map without extending it (reference:
        System::ActivateLocalizationMode src/System.cc:488 — stops
        LocalMapping; here mapping steps are simply skipped)."""
        self.enable_mapping = False
        self.tracker.localization_vo = True

    def deactivate_localization_mode(self):
        """Resume full SLAM (reference: DeactivateLocalizationMode)."""
        self.enable_mapping = True
        self.tracker.localization_vo = False
        self.tracker.pending_kf = None   # drop any stale pending keyframe

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe poses only, TUM format (reference:
        SaveKeyFrameTrajectoryTUM src/System.cc:639)."""
        from dani_slam_tpu.utils import io as io_utils
        st = self.tracker.st
        mask = np.asarray(st.kf_mask)
        ids = np.nonzero(mask)[0]
        order = ids[np.argsort(np.asarray(st.kf_time)[ids])]
        traj = [(float(st.kf_time[k]), np.asarray(st.kf_R[k]),
                 np.asarray(st.kf_t[k])) for k in order]
        io_utils.save_trajectory_tum(path, traj)

    def save_atlas(self, path: str):
        """Persist the active map + place-recognition DB (reference:
        System::SaveAtlas src/System.cc:1413 — Boost archive + voc MD5)."""
        from dani_slam_tpu.utils import checkpoint
        cb = self.loop_closer.codebook if self.loop_closer else None
        bow = self.loop_closer.bow if self.loop_closer else None
        checkpoint.save_map(path, self.tracker.st, codebook=cb, bow=bow)

    def load_atlas(self, path: str):
        """Load a map saved by save_atlas; verifies the codebook checksum
        (reference: LoadAtlas + MD5 gate, src/System.cc:1455-1516)."""
        from dani_slam_tpu.utils import checkpoint
        expect = self.loop_closer.codebook if self.loop_closer else None
        st, extras = checkpoint.load_map(path, expect_codebook=expect)
        self.tracker.st = st
        if self.loop_closer is not None and "bow" in extras:
            self.loop_closer.bow = extras["bow"]
        # resume tracking against the loaded map via relocalization
        self.tracker.state = tracking.RECENTLY_LOST
        self.tracker.frames_lost = 1
        self.tracker.last_bind = jnp.full((self.caps.N,), -1, jnp.int32)

    def _sp(self):
        if self.sp_params is None:
            import jax
            from dani_slam_tpu.models import superpoint
            self.sp_params = superpoint.load_default_params()
            if self.sp_params is None:     # no shipped weights: random init
                self.sp_params = superpoint.init_params(jax.random.PRNGKey(0))
        return self.sp_params
