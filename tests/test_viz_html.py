"""Interactive viewer (utils/viz_html) — the reference's RViz surface role
(``mapOptmization.cpp:421-490,723-774``) rebuilt as a dependency-free WebGL
page + no-cache HTTP server over the streamed viz artifacts."""

import json
import os
import threading
import urllib.request

import numpy as np

from msst_tpu.utils import viz, viz_html


def test_write_viewer_and_trajectory_json(tmp_path):
    d = str(tmp_path)
    out = viz_html.write_viewer(d)
    html = open(out).read()
    assert "<!doctype html>" in html.lower()
    assert "webgl" in html  # actually a GL viewer, not a stub page
    assert "global_map.ply" in html and "trajectory.json" in html

    est = np.arange(12, dtype=float).reshape(4, 3)
    viz_html.write_trajectory_json(os.path.join(d, "trajectory.json"), est)
    back = json.load(open(os.path.join(d, "trajectory.json")))
    np.testing.assert_allclose(np.asarray(back["xyz"]), est)
    assert not os.path.exists(os.path.join(d, "trajectory.json.tmp"))


def test_viz_serve_live_artifacts(tmp_path):
    """End-to-end: server hands out viewer + PLY + trajectory with caching
    disabled, and an overwrite (the --viz-every stream) is visible on the
    next fetch — the live-reload contract."""
    d = str(tmp_path)
    viz.write_ply(os.path.join(d, "global_map.ply"),
                  np.asarray([[0.0, 0, 0], [1, 2, 3]]))
    viz_html.write_trajectory_json(os.path.join(d, "trajectory.json"),
                                   np.zeros((2, 3)))
    srv = viz_html.make_server(d, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        def get(name):
            r = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/{name}", timeout=10)
            assert r.headers["Cache-Control"] == "no-store"
            return r.read().decode()

        assert "webgl" in get("viewer.html")
        ply = get("global_map.ply")
        assert "element vertex 2" in ply
        # overwrite (atomic rename like the stream) -> next fetch sees it
        tmp = os.path.join(d, ".global_map.ply.tmp")
        viz.write_ply(tmp, np.zeros((3, 3)))
        os.replace(tmp, os.path.join(d, "global_map.ply"))
        assert "element vertex 3" in get("global_map.ply")
        assert json.loads(get("trajectory.json"))["xyz"] == [[0, 0, 0]] * 2
    finally:
        srv.shutdown()
        srv.server_close()
