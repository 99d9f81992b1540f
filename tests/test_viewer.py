"""Interactive live viewer (utils/viewer.py) — HTTP surface test.

Equivalent of the reference's PyBullet GUI + debug camera
(simulation.py:325-330, camera_config.py) for headless TPU hosts.
"""
import json
import time
import urllib.request as rq

import numpy as np
import pytest


@pytest.mark.slow
def test_viewer_http_roundtrip():
    from rmp_tpu import envs
    from rmp_tpu.utils.viewer import SimViewer, encode_png

    # stdlib PNG encoder sanity
    rgb = (np.arange(24 * 32 * 3, dtype=np.uint8).reshape(24, 32, 3))
    png = encode_png(rgb)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    v = SimViewer(envs.make("two_joint/01_target_rmp_only"), port=0,
                  width=128, height=96, realtime=False).start()
    try:
        host, port = v.address
        base = f"http://{host}:{port}"
        time.sleep(3)  # sim thread compiles + steps

        frame = rq.urlopen(base + "/frame.png", timeout=60).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"
        st = json.loads(rq.urlopen(base + "/state", timeout=30).read())
        assert st["tick"] > 0 and len(st["q"]) == 2

        # orbit changes the rendered view
        rq.urlopen(rq.Request(base + "/camera", method="POST",
                              data=json.dumps({"dyaw": 90.0}).encode()),
                   timeout=30).read()
        rq.urlopen(rq.Request(base + "/pause", data=b"", method="POST"),
                   timeout=30).read()
        time.sleep(0.5)
        frame2 = rq.urlopen(base + "/frame.png", timeout=60).read()
        assert frame2 != frame

        # pause freezes the tick counter; reset restarts it
        t0 = json.loads(rq.urlopen(base + "/state", timeout=30).read())["tick"]
        time.sleep(0.8)
        assert json.loads(rq.urlopen(base + "/state",
                                     timeout=30).read())["tick"] == t0
        rq.urlopen(rq.Request(base + "/reset", data=b"", method="POST"),
                   timeout=30).read()
        rq.urlopen(rq.Request(base + "/resume", data=b"", method="POST"),
                   timeout=30).read()

        # malformed camera body -> 400, not a crash
        try:
            rq.urlopen(rq.Request(base + "/camera", data=b"nope",
                                  method="POST"), timeout=30)
            raise AssertionError("bad json accepted")
        except rq.HTTPError as e:
            assert e.code == 400
    finally:
        v.stop()
