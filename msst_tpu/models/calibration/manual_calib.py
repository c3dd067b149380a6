"""Interactive manual extrinsic calibration (terminal version).

Rebuild of ``SensorsCalibration/lidar2lidar/manual_calib`` (Pangolin GL tool,
``run_lidar2lidar.cpp:31-493``): keyboard nudges adjust the source->target
extrinsic with an adjustable step, and the result saves as the same JSON
layout (``extrinsic_param.hpp``).  Instead of a GL render, each nudge reports
a quantitative alignment score (mean NN distance + inlier fraction) computed
on device — scriptable for automation and usable over ssh.

Keymap (matches ``lidar2lidar/README.md:52-62``):
    q/a  +-roll     w/s  +-pitch    e/d  +-yaw
    r/f  +-x        t/g  +-y        y/h  +-z
    u/j  double/halve the step      p    print extrinsic
    z    save JSON and exit         x    exit without saving
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import knn, se3


class ManualCalibrator:
    def __init__(self, source_xyz: np.ndarray, target_xyz: np.ndarray,
                 init_pose: se3.Pose | None = None,
                 rot_step_deg: float = 0.3, trans_step: float = 0.06):
        self.src = jnp.asarray(np.asarray(source_xyz, np.float32))
        tgt = jnp.asarray(np.asarray(target_xyz, np.float32))
        self.grid = knn.build(tgt, jnp.ones(len(target_xyz), bool),
                              cell_size=1.0, table_size=16384)
        self.pose = init_pose or se3.Pose.identity()
        self.rot_step = np.radians(rot_step_deg)
        self.trans_step = trans_step
        self._score = jax.jit(self._score_fn)

    def _score_fn(self, pose: se3.Pose):
        moved = pose.apply(self.src)
        res = knn.query(self.grid, moved, jnp.ones(moved.shape[0], bool), k=1,
                        candidates_per_cell=16, max_sqdist=1.0)
        ok = res.valid[:, 0]
        n = jnp.maximum(jnp.sum(ok), 1)
        mean_d = jnp.sum(jnp.where(ok, jnp.sqrt(res.sqdist[:, 0]), 0.0)) / n
        return mean_d, jnp.mean(ok.astype(jnp.float32))

    def score(self):
        d, f = self._score(self.pose)
        return float(d), float(f)

    def nudge(self, key: str) -> bool:
        """Apply one keymap action; returns False on exit keys."""
        rs, ts = self.rot_step, self.trans_step
        deltas = {
            "q": (0, rs), "a": (0, -rs), "w": (1, rs), "s": (1, -rs),
            "e": (2, rs), "d": (2, -rs),
            "r": (3, ts), "f": (3, -ts), "t": (4, ts), "g": (4, -ts),
            "y": (5, ts), "h": (5, -ts),
        }
        if key in deltas:
            axis, amt = deltas[key]
            v6 = np.array(self.pose.to_vec6())
            v6[axis] += amt
            self.pose = se3.Pose.from_vec6(jnp.asarray(v6))
            return True
        if key == "u":
            self.rot_step *= 2.0
            self.trans_step *= 2.0
            return True
        if key == "j":
            self.rot_step *= 0.5
            self.trans_step *= 0.5
            return True
        if key == "p":
            print(self.extrinsic_json())
            return True
        return key not in ("z", "x")

    def extrinsic_json(self) -> str:
        """Same JSON layout as the reference's saveResult (extrinsic_param)."""
        T = np.asarray(self.pose.to_matrix())
        return json.dumps({
            "extrinsic": {
                "rotation": T[:3, :3].tolist(),
                "translation": T[:3, 3].tolist(),
                "matrix": T.tolist(),
            }
        }, indent=2)

    def save(self, path: str):
        with open(path, "w") as f:
            f.write(self.extrinsic_json())

    def run_interactive(self):  # pragma: no cover - needs a tty
        print(__doc__)
        while True:
            d, frac = self.score()
            print(f"mean NN dist {d*100:.2f} cm | matched {frac*100:.1f}% | "
                  f"step {np.degrees(self.rot_step):.2f} deg / {self.trans_step*100:.1f} cm")
            key = input("key> ").strip()[:1]
            if not self.nudge(key):
                if key == "z":
                    self.save("extrinsic.json")
                    print("saved extrinsic.json")
                break
