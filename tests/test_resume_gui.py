"""Mid-train checkpoint/resume and network-GUI wiring.

Resume parity: HAC/train.py:108-110,250-252 (--start_checkpoint restores
params + optimizer state + iteration). The oracle is determinism: training
N iters straight must equal training N/2, snapshotting, and resuming —
same loss, same anchor buffers. GUI parity: HAC/train.py:122-136 polls the
SIBR socket protocol each iteration; here a loopback client sends one
camera and must get the rendered frame back mid-train.
"""

import json
import socket
import struct
import threading

import numpy as np
import jax
import pytest

from gauspcc_tpu.codecs.gauspcgc import model as pcc_model
from gauspcc_tpu.models.hac import pipeline
from gauspcc_tpu.models.hac import train as hac_train

from tests.test_hac_train import SMALL_CFG, _gt_scene, _orbit_camera, _render_gt
from tests.test_hac_pipeline import _FakeScene


def _make_scene():
    rng = np.random.default_rng(1)
    scene_g = _gt_scene(rng)
    cams = []
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, 5, endpoint=False)):
        c = _orbit_camera(i, ang)
        c.image = _render_gt(c, scene_g)
        cams.append(c)
    pts = (rng.random((300, 3)) * 1.2 - 0.6).astype(np.float32)
    return _FakeScene(cams, pts, extent=4.0)


def _pcc():
    cfg = pcc_model.NetConfig(channels=8, kernel_size=3)
    return pcc_model.init_params(jax.random.PRNGKey(3), cfg), cfg


@pytest.mark.slow
def test_checkpoint_resume_is_deterministic(tmp_path):
    scene = _make_scene()
    # densification inside the window exercises opt-state remapping across
    # the snapshot boundary
    opt = hac_train.OptConfig(iterations=24, start_stat=2, update_from=5,
                              update_interval=8, update_until=22, lmbda=1e-3)

    straight_logs = []
    state_a, _ = pipeline.train_scene(
        scene, SMALL_CFG, opt, str(tmp_path / "straight"), None, None,
        log_every=4, eval_at_end=False,
        logger=type("L", (), {"info": lambda self, m: straight_logs.append(m)})(),
    )

    # first half, snapshot at 12, then "killed" (stop_at simulates the kill;
    # opt is identical so the lr schedules match the straight run)
    pipeline.train_scene(
        scene, SMALL_CFG, opt,
        str(tmp_path / "half"), None, None, log_every=4, eval_at_end=False,
        checkpoint_every=12, stop_at=12,
    )
    resumed_logs = []
    state_b, _ = pipeline.train_scene(
        scene, SMALL_CFG, opt, str(tmp_path / "resumed"), None, None,
        log_every=4, eval_at_end=False,
        start_checkpoint=str(tmp_path / "half" / "train_ckpt.pkl"),
        logger=type("L", (), {"info": lambda self, m: resumed_logs.append(m)})(),
    )

    a = {k: np.asarray(v) for k, v in state_a["anchors"].items()}
    b = {k: np.asarray(v) for k, v in state_b["anchors"].items()}
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0,
                                   err_msg=f"anchors/{k} diverged after resume")
    np.testing.assert_array_equal(np.asarray(state_a["valid"]),
                                  np.asarray(state_b["valid"]))
    # the straight run's final logged metrics match the resumed run's
    tail_a = [m for m in straight_logs if m.startswith("iter 24:")]
    tail_b = [m for m in resumed_logs if m.startswith("iter 24:")]
    assert tail_a and tail_b
    # strip timing (differs between runs)
    assert tail_a[0].split("(")[0] == tail_b[0].split("(")[0]


@pytest.mark.slow
def test_gui_roundtrips_a_frame(tmp_path):
    from gauspcc_tpu.utils.network_gui import NetworkGUI

    scene = _make_scene()
    opt = hac_train.OptConfig(iterations=6, update_from=100,
                              update_until=0, lmbda=1e-3)
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    got = {}

    def viewer():
        cli = socket.create_connection(("127.0.0.1", port), timeout=30)
        w, h = 16, 12
        wvt = np.eye(4, dtype=np.float32)
        wvt[3, 2] = 3.0
        # undo the axis flips receive() applies
        msg_m = wvt.copy()
        msg_m[:, 1] = -msg_m[:, 1]
        msg_m[:, 2] = -msg_m[:, 2]
        msg = {
            "resolution_x": w, "resolution_y": h,
            "train": True, "keep_alive": False, "scaling_modifier": 1.0,
            "fov_x": 1.0, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
            "view_matrix": msg_m.reshape(-1).tolist(),
        }
        payload = json.dumps(msg).encode()
        cli.sendall(struct.pack("<I", len(payload)) + payload)
        img = b""
        want = w * h * 3
        while len(img) < want:
            chunk = cli.recv(want - len(img))
            if not chunk:
                raise ConnectionError("train side closed early")
            img += chunk
        n = struct.unpack("<I", cli.recv(4))[0]
        verify = cli.recv(n).decode()
        got["img"] = np.frombuffer(img, np.uint8).reshape(h, w, 3)
        got["verify"] = verify
        cli.close()

    t = threading.Thread(target=viewer, daemon=True)
    t.start()
    try:
        pipeline.train_scene(
            scene, SMALL_CFG, opt, str(tmp_path / "gui"), None, None,
            log_every=50, eval_at_end=False, gui=gui,
        )
    finally:
        gui.close()
    t.join(timeout=30)
    assert not t.is_alive(), "viewer thread never got a frame"
    assert got["img"].shape == (12, 16, 3)
    assert got["verify"]
