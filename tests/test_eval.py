"""Eval-layer tests: masked metrics, LPIPS plumbing, render buckets +
results.txt format."""
import numpy as np
import jax.numpy as jnp

from egogaussian_tpu.data import make_synthetic_video
from egogaussian_tpu.eval import calculate_metric, render_results
from egogaussian_tpu.eval.lpips import LPIPS, convert_torch_lpips, load_lpips_weights
from egogaussian_tpu.eval.metrics import evaluate_metrics, masked_psnr
from egogaussian_tpu.models.pose import empty_pose_sequence
from egogaussian_tpu.models import from_points


def test_masked_psnr_ignores_hand_pixels():
    gt = np.zeros((3, 16, 16), np.float32)
    render = np.zeros((3, 16, 16), np.float32)
    hand = np.zeros((1, 16, 16), np.float32)
    hand[0, :8] = 1.0
    render[:, :8] = 1.0  # error only under the hand
    v = float(masked_psnr(jnp.asarray(render), jnp.asarray(gt), jnp.asarray(hand)))
    assert v > 60  # masked out -> near-perfect


def test_evaluate_metrics_means():
    gt = [np.random.RandomState(i).rand(3, 16, 16).astype(np.float32) for i in range(3)]
    hands = [np.zeros((1, 16, 16), np.float32)] * 3
    out = evaluate_metrics(gt, gt, hands)
    assert out["psnr"] > 60
    assert abs(out["ssim"] - 1.0) < 1e-3


class TestLPIPS:
    def test_random_weights_plumbing(self):
        lp = LPIPS(allow_random=True)
        x = np.random.RandomState(0).rand(3, 32, 32).astype(np.float32)
        y = np.random.RandomState(1).rand(3, 32, 32).astype(np.float32)
        d_same = float(np.asarray(lp(x, x)))
        d_diff = float(np.asarray(lp(x, y)))
        assert d_same < 1e-6
        assert d_diff > d_same

    def test_requires_weights_by_default(self):
        import pytest

        with pytest.raises(ValueError):
            LPIPS()

    def test_weight_conversion_roundtrip(self, tmp_path):
        # fabricate torch-style state dicts and convert
        rng = np.random.RandomState(0)
        conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
        vgg_state = {}
        in_c = 3
        for i, (li, c) in enumerate(zip(conv_idx, chans)):
            vgg_state[f"features.{li}.weight"] = rng.randn(c, in_c, 3, 3).astype(np.float32)
            vgg_state[f"features.{li}.bias"] = rng.randn(c).astype(np.float32)
            in_c = c
        lpips_state = {
            f"lin{j}.model.1.weight": rng.rand(1, c, 1, 1).astype(np.float32)
            for j, c in zip(range(5), [64, 128, 256, 512, 512])
        }
        path = str(tmp_path / "lpips.npz")
        convert_torch_lpips(vgg_state, lpips_state, path)
        w = load_lpips_weights(path)
        assert len(w.convs) == 13 and len(w.lins) == 5
        lp = LPIPS(weights=w)
        x = np.random.RandomState(2).rand(3, 32, 32).astype(np.float32)
        assert float(np.asarray(lp(x, x))) < 1e-6


class TestRenderResults:
    def test_buckets_and_results_txt(self, tmp_path):
        vid = make_synthetic_video(width=32, height=24, n_bg=60, n_obj=20,
                                   frames_static=2, frames_dynamic=1)
        model = from_points(vid.points, vid.colors, capacity=256)
        seq = empty_pose_sequence(len(vid.cameras))
        names = [c.image_name for c in vid.cameras]
        buckets = render_results(
            vid.cameras, model, seq,
            training_frames=names[:3],
            dynamic_eval_frames=[names[3]],
            static_eval_frames=[names[4]],
            save_dir=str(tmp_path),
        )
        assert len(buckets["training"]) == 3
        assert len(buckets["dynamic_eval"]) == 1
        assert len(buckets["static_eval"]) == 1
        results = calculate_metric(buckets, save_dir=str(tmp_path))
        assert "dynamic_eval" in results and "static_eval" in results
        txt = (tmp_path / "results.txt").read_text()
        assert "PSNR" in txt and "SSIM" in txt
        assert (tmp_path / "dynamic_eval" / f"{names[3]}.png").exists()
