"""IMU intrinsic calibration via Allan variance.

Rebuild of ``imu_calib/src/imu_utils`` (``imu_an.cpp``): collect IMU samples
for ``max_time_min`` minutes, compute per-axis overlapping Allan variance
over log-spaced cluster factors (``allan_gyr.cpp:41-148``), fit the
5-coefficient model (``fitallan_gyr.cpp`` — Ceres DOGLEG there, linear LSQ
here, see ``ops.imu.fit_allan``), and emit the noise YAML the LIO pipeline
consumes as imuAccNoise/imuGyrNoise/imuAccBiasN/imuGyrBiasN
(``imu_an.cpp:117-202`` writeYAML).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ...ops import imu as imu_ops


@dataclasses.dataclass
class AllanCalibrator:
    name: str = "imu"
    max_samples: int = 500_000
    n_clusters: int = 100

    def __post_init__(self):
        self._gyro: list = []
        self._acc: list = []
        self._t: list = []

    def add_sample(self, t: float, gyro, acc):
        if len(self._t) < self.max_samples:
            self._t.append(t)
            self._gyro.append(np.asarray(gyro, np.float64))
            self._acc.append(np.asarray(acc, np.float64))

    @property
    def duration_min(self) -> float:
        if len(self._t) < 2:
            return 0.0
        return (self._t[-1] - self._t[0]) / 60.0

    def compute(self) -> dict:
        t = np.asarray(self._t)
        dt = float(np.median(np.diff(t)))
        gyro = np.stack(self._gyro)     # rad/s
        acc = np.stack(self._acc)       # m/s^2
        n = len(t)
        ms = imu_ops.log_spaced_clusters(n, self.n_clusters)
        taus = np.asarray(ms, np.float64) * dt

        def per_axis(sig):
            av = np.asarray(imu_ops.allan_variance(
                jnp.asarray(sig.astype(np.float32)), dt, ms))
            fit = imu_ops.fit_allan(jnp.asarray(taus.astype(np.float32)),
                                    jnp.asarray(av))
            return {
                "white_noise": float(fit.white_noise),
                "bias_instability": float(fit.bias_instability),
                "taus": taus.tolist(),
                "avar": av.tolist(),
            }

        gyr_axes = [per_axis(gyro[:, i]) for i in range(3)]
        acc_axes = [per_axis(acc[:, i]) for i in range(3)]
        avg = lambda key, axes: float(np.mean([a[key] for a in axes]))  # noqa: E731
        return {
            "imu_name": self.name,
            "duration_min": self.duration_min,
            "gyr_n": avg("white_noise", gyr_axes),       # -> imuGyrNoise
            "gyr_w": avg("bias_instability", gyr_axes),  # -> imuGyrBiasN
            "acc_n": avg("white_noise", acc_axes),       # -> imuAccNoise
            "acc_w": avg("bias_instability", acc_axes),  # -> imuAccBiasN
            "gyr_axes": gyr_axes,
            "acc_axes": acc_axes,
        }

    def write_yaml(self, path: str):
        r = self.compute()
        lines = [
            "%YAML:1.0",
            "---",
            f"type: IMU",
            f"name: {r['imu_name']}",
            "Gyr:",
            "  unit: \"rad/s\"",
            "  avg-axis:",
            f"    gyr_n: {r['gyr_n']:.12e}",
            f"    gyr_w: {r['gyr_w']:.12e}",
            "Acc:",
            "  unit: \"m/s^2\"",
            "  avg-axis:",
            f"    acc_n: {r['acc_n']:.12e}",
            f"    acc_w: {r['acc_w']:.12e}",
        ]
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return r
