"""IoU evaluator and meter math tests (reference semantics:
evaluation_util/common/evaluation.py, logger.py)."""

import numpy as np
import torch

from diffews_tpu.evaluation import AverageMeter, Evaluator


class TestEvaluator:
    def test_simple_iou(self):
        pred = np.array([[[1, 1, 0, 0]]])
        gt = np.array([[[1, 0, 0, 0]]])
        inter, union = Evaluator.classify_prediction(pred, gt)
        # fg: inter 1, union 2; bg: inter 2, union 3
        np.testing.assert_array_equal(inter[:, 0], [2, 1])
        np.testing.assert_array_equal(union[:, 0], [3, 2])

    def test_matches_torch_histc_semantics(self):
        rng = np.random.default_rng(0)
        pred = (rng.random((2, 17, 13)) > 0.5).astype(np.int64)
        gt = (rng.random((2, 17, 13)) > 0.5).astype(np.int64)
        inter, union = Evaluator.classify_prediction(pred, gt)
        # torch oracle
        pi, gi = torch.from_numpy(pred).float(), torch.from_numpy(gt).float()
        for b in range(2):
            agree = pi[b][pi[b] == gi[b]]
            t_inter = torch.histc(agree, bins=2, min=0, max=1)
            t_pred = torch.histc(pi[b], bins=2, min=0, max=1)
            t_gt = torch.histc(gi[b], bins=2, min=0, max=1)
            np.testing.assert_array_equal(inter[:, b], t_inter.numpy())
            np.testing.assert_array_equal(union[:, b], (t_pred + t_gt - t_inter).numpy())

    def test_ignore_index(self):
        pred = np.array([[[1, 1, 0, 0]]])
        gt = np.array([[[1, 0, 0, 0]]])
        ignore = np.array([[[0, 0, 0, 1]]])
        inter, union = Evaluator.classify_prediction(pred, gt, ignore)
        # last pixel becomes 255 in both => excluded everywhere
        np.testing.assert_array_equal(inter[:, 0], [1, 1])
        np.testing.assert_array_equal(union[:, 0], [2, 2])


class TestAverageMeter:
    def test_miou_fbiou(self):
        m = AverageMeter("coco", class_ids=[0, 4])
        # class 0: fg iou 0.5 ; class 4: fg iou 1.0
        m.update(np.array([[10], [5]]), np.array([[20], [10]]), [0])
        m.update(np.array([[10], [10]]), np.array([[10], [10]]), [4])
        miou, fb_iou, _ = m.compute_iou()
        assert abs(miou - 75.0) < 1e-6
        # fb: fg (5+10)/(10+10)=0.75 ; bg (10+10)/(20+10)=2/3
        assert abs(fb_iou - ((0.75 + 2 / 3) / 2 * 100)) < 1e-6

    def test_unseen_class_counts_zero(self):
        m = AverageMeter("coco", class_ids=[0, 4])
        m.update(np.array([[10], [5]]), np.array([[20], [10]]), [0])
        miou, _, _ = m.compute_iou()
        # class 4 contributes 0 IoU (union clamped to 1)
        assert abs(miou - 25.0) < 1e-6

    def test_batched_update(self):
        m = AverageMeter("coco", class_ids=[0, 1])
        m.update(np.array([[1, 2], [3, 4]]), np.array([[2, 4], [6, 8]]), [0, 1])
        miou, _, _ = m.compute_iou()
        assert abs(miou - 50.0) < 1e-6


class TestVisualizer:
    def test_episode_strips_written_with_class_and_iou_tags(self, tmp_path):
        """The reference dumps [supports | query GT | prediction] strips
        named by class id and IoU under the vis dir (`common/vis.py:30-74`,
        `main_oss.py:159-165`); ours must produce the same artifact kind."""
        import os

        from diffews_tpu.evaluation.vis import Visualizer

        rng = np.random.default_rng(0)
        b, n, s = 2, 1, 16
        Visualizer.initialize(True, str(tmp_path / "vis"))
        try:
            Visualizer.visualize_prediction_batch(
                rng.uniform(-1, 1, (b, n, 3, s, s)).astype(np.float32),
                rng.integers(0, 2, (b, n, s, s)).astype(np.float32),
                rng.uniform(-1, 1, (b, 3, s, s)).astype(np.float32),
                rng.integers(0, 2, (b, s, s)).astype(np.float32),
                rng.integers(0, 2, (b, s, s)).astype(np.float32),
                np.array([3, 7]), batch_idx=0,
                iou=np.array([0.5, 0.25]),
            )
        finally:
            Visualizer.initialize(False)
        files = sorted(os.listdir(tmp_path / "vis"))
        assert len(files) == b
        assert any("class-3" in f and "iou-0.50" in f for f in files)
        assert any("class-7" in f and "iou-0.25" in f for f in files)

    def test_noop_when_disabled(self, tmp_path):
        from diffews_tpu.evaluation.vis import Visualizer

        Visualizer.initialize(False, str(tmp_path / "vis2"))
        Visualizer.visualize_prediction_batch(
            None, None, np.zeros((1, 3, 4, 4)), None, None, [0], 0)
        assert not (tmp_path / "vis2").exists()
