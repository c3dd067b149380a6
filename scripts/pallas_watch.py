"""Re-attempt Mosaic lowering of the parked Pallas kernels on real TPU.

Scripted toolchain watch (round-2 VERDICT #10): run this after every
jax/libtpu bump.  Prints one JSON line with the outcome; if the lowering
ever SUCCEEDS, flip ``LioParams.use_pallas`` to "auto" and re-benchmark
(DESIGN.md "Pallas status" documents the current blocker: Mosaic's
``tpu.dynamic_gather`` is a single-vreg lane shuffle).

Usage:  python scripts/pallas_watch.py        # on the TPU host
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_pallas_toolchain import _attempt_lowering

    backend = jax.default_backend()
    if backend != "tpu":
        print(json.dumps({"backend": backend, "status": "skipped",
                          "reason": "no TPU backend in this process"}))
        return
    ok, err = _attempt_lowering()
    print(json.dumps({
        "backend": backend,
        "jax": jax.__version__,
        "status": "LOWERED — re-evaluate use_pallas!" if ok else "blocked",
        "error_head": err[:300],
    }))


if __name__ == "__main__":
    main()
