"""dani_slam_tpu — a TPU-native dynamic-aware visual(-inertial) SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DANI-SLAM (an
ORB-SLAM3-derived C++ system with SuperPoint features, LightGlue matching and
YOLOv5 dynamic-object masking; see /root/reference and SURVEY.md).

Architecture (TPU-first, not a port):
  * functional fixed-capacity map state (pytree of padded arrays + masks)
    replacing the reference's pointer graph + ~20 mutexes,
  * Flax re-implementations of the three learned modules (SuperPoint,
    LightGlue, YOLO) running batched in HBM,
  * Pallas kernels for the hot front-end ops (score-map NMS, descriptor
    sampling) and solver inner loops,
  * vmapped RANSAC (two-view H/F, MLPnP, Horn Sim3) instead of sequential
    hypothesis loops,
  * batched sparse Gauss-Newton/LM with Schur elimination for local/global/
    inertial BA and Sim3 pose-graph optimization (replaces g2o),
  * on-device hierarchical descriptor quantization + inverted-index scoring
    for place recognition (replaces DBoW3).

Public API mirrors the reference facade (reference: include/System.h:105-198):
    from dani_slam_tpu import System, Sensor
    slam = System(config, sensor=Sensor.MONOCULAR)
    pose = slam.track_monocular(img, t)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing the facade pulls in flax models; keep `import
    # dani_slam_tpu` cheap for users who only want the math/ops layers.
    if name in ("System", "Sensor"):
        from dani_slam_tpu.slam.system import Sensor, System
        return {"System": System, "Sensor": Sensor}[name]
    raise AttributeError(name)
