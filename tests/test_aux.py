"""Tests for auxiliary subsystems: checkpointing, metrics logging, viewer
protocol, trajectory rendering, montages (SURVEY.md §5 rows)."""
import json
import socket
import struct
import threading

import jax.numpy as jnp
import numpy as np

from egogaussian_tpu.data import make_synthetic_video
from egogaussian_tpu.models import adam_init, from_points
from egogaussian_tpu.models.gaussians import make_it_a_point
from egogaussian_tpu.models.pose import empty_pose_sequence
from egogaussian_tpu.train.common import TrainState
from egogaussian_tpu.utils.checkpoint import load_train_state, save_train_state
from egogaussian_tpu.utils.logging import MetricsLogger, StepTimer


def small_model(n=20):
    rng = np.random.RandomState(0)
    return from_points(rng.randn(n, 3).astype(np.float32),
                       rng.rand(n, 3).astype(np.float32), capacity=64)


class TestCheckpoint:
    def test_round_trip(self, tmp_path):
        model = small_model()
        state = TrainState(
            model=model, opt_state=adam_init(model.params),
            step=jnp.int32(42),
        )
        path = str(tmp_path / "ckpt.npz")
        save_train_state(path, state)
        like = TrainState(
            model=small_model(), opt_state=adam_init(model.params),
            step=jnp.int32(0),
        )
        restored = load_train_state(path, like)
        assert int(restored.step) == 42
        np.testing.assert_allclose(
            np.asarray(restored.model.params.xyz),
            np.asarray(model.params.xyz),
        )

    def test_shape_mismatch_raises(self, tmp_path):
        model = small_model()
        path = str(tmp_path / "c.npz")
        save_train_state(path, model.params)
        import pytest

        bigger = from_points(
            np.random.randn(20, 3).astype(np.float32),
            np.random.rand(20, 3).astype(np.float32), capacity=128,
        )
        with pytest.raises(AssertionError):
            load_train_state(path, bigger.params)


class TestLogging:
    def test_jsonl(self, tmp_path):
        log = MetricsLogger(log_dir=str(tmp_path))
        log.log(1, loss=0.5, num_points=100)
        log.log(2, loss=0.25)
        log.close()
        lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert rec["step"] == 1 and rec["loss"] == 0.5

    def test_step_timer(self):
        t = StepTimer()
        assert t.tick() is None
        assert t.tick() is not None
        assert t.steps_per_sec > 0


class TestMakeItAPoint:
    def test_collapses_to_centroid(self):
        m = small_model()
        pt = make_it_a_point(m, color="blue")
        assert int(pt.num_alive) == 1
        alive = np.asarray(m.aux.alive)
        centroid = np.asarray(m.params.xyz)[alive].mean(0)
        np.testing.assert_allclose(
            np.asarray(pt.params.xyz[0]), centroid, atol=1e-5
        )


class TestViewerProtocol:
    def test_render_round_trip(self):
        from egogaussian_tpu.eval.network_viewer import serve

        model = small_model()
        # pick a free port
        probe = socket.socket()
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
        probe.close()

        result = {}
        th = threading.Thread(
            target=lambda: result.update(
                n=serve(model, port=port, max_messages=1)
            )
        )
        th.start()
        import time

        time.sleep(0.5)
        cli = socket.create_connection(("127.0.0.1", port), timeout=30)
        w, h = 32, 24
        msg = {
            "resolution_x": w, "resolution_y": h, "train": False,
            "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": False, "scaling_modifier": 1.0,
            "view_matrix": np.eye(4, dtype=np.float32).ravel().tolist(),
            "view_projection_matrix": np.eye(4, dtype=np.float32).ravel().tolist(),
        }
        payload = json.dumps(msg).encode()
        cli.sendall(struct.pack("<I", len(payload)) + payload)
        img = b""
        want = w * h * 3
        while len(img) < want:
            img += cli.recv(want - len(img))
        (vlen,) = struct.unpack("<I", cli.recv(4))
        verify = cli.recv(vlen).decode()
        cli.close()
        th.join(timeout=30)
        assert verify == "ok"
        assert result["n"] == 1
        arr = np.frombuffer(img, np.uint8).reshape(h, w, 3)
        assert arr.shape == (24, 32, 3)


class TestTrajectory:
    def test_render_trajectory_accumulates(self, tmp_path):
        from egogaussian_tpu.eval.viewer import render_trajectory, interpolate_cameras

        vid = make_synthetic_video(width=32, height=24, n_bg=40, n_obj=12,
                                   frames_static=2, frames_dynamic=2)
        bg = small_model(30)
        obj = small_model(10)
        seq = empty_pose_sequence(len(vid.cameras))
        out = render_trajectory(
            vid.cameras, bg, obj, seq, save_dir=str(tmp_path),
        )
        assert int(out.num_alive) == int(bg.num_alive) + len(vid.cameras)
        assert (tmp_path / f"{vid.cameras[0].image_name}.png").exists()

    def test_interpolate_cameras(self):
        from egogaussian_tpu.eval.viewer import interpolate_cameras

        vid = make_synthetic_video(width=32, height=24, n_bg=20, n_obj=8,
                                   frames_static=2, frames_dynamic=1)
        cams = interpolate_cameras(vid.cameras[0], vid.cameras[-1], 5)
        assert len(cams) == 5
        np.testing.assert_allclose(
            np.asarray(cams[0].viewmat), np.asarray(vid.cameras[0].viewmat),
            atol=1e-5,
        )
        # orthonormal rotations throughout
        for c in cams:
            R = np.asarray(c.viewmat[:3, :3])
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
