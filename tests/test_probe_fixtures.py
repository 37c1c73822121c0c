"""Tests for the probe fixture world + representation-quality metrics.

These carry the round-5 probe-delta artifact (scripts/probe_delta.py →
BASELINE.md): the synthetic reach world must emit a valid Ego4D training
layout, expose its ground-truth latents consistently, and the two probe
metrics (grouped ridge R², zero-shot reward-ordering accuracy) must
behave correctly on known inputs — otherwise the artifact's numbers mean
nothing. Reference behavior being evidenced: the downstream-evaluation
role of ``/root/reference/README.md:36-38`` (out-of-repo BC eval branch).
"""

import numpy as np
import pytest

from r3m_tpu.evalsuite.fixtures import (
    linear_probe,
    render_probe_set,
    reward_order_acc,
    write_probe_dataset,
)


@pytest.fixture(scope="module")
def probe():
    return render_probe_set(n_videos=6, n_frames=8, size=32, seed=7)


class TestRenderProbeSet:
    def test_shapes_and_dtypes(self, probe):
        n = 6 * 8
        assert probe["images"].shape == (n, 3, 32, 32)
        assert probe["images"].dtype == np.uint8
        assert probe["actions"].shape == (n, 2)
        assert probe["latents"].shape == (n, 4)
        assert probe["progress"].shape == (n,)
        assert probe["video"].shape == (n,)

    def test_actions_unit_vectors(self, probe):
        norms = np.linalg.norm(probe["actions"], axis=1)
        # unit block->goal vectors everywhere except exactly at the goal
        assert np.all((np.abs(norms - 1.0) < 1e-5) | (norms == 0.0))
        # the final frame IS the goal: zero action
        last = probe["progress"] == 1.0
        assert np.all(norms[last] < 1e-5)

    def test_latents_in_unit_square_and_goal_static(self, probe):
        assert probe["latents"].min() >= 0.0
        assert probe["latents"].max() <= 1.0
        for v in np.unique(probe["video"]):
            goal = probe["latents"][probe["video"] == v, 2:4]
            assert np.allclose(goal, goal[0])  # static per video

    def test_progress_monotone_per_video(self, probe):
        for v in np.unique(probe["video"]):
            p = probe["progress"][probe["video"] == v]
            assert np.all(np.diff(p) > 0)
            assert p[0] == 0.0 and p[-1] == 1.0

    def test_block_moves_toward_goal(self, probe):
        # pixel-space distance block->goal strictly decreases
        for v in np.unique(probe["video"]):
            lat = probe["latents"][probe["video"] == v]
            d = np.linalg.norm(lat[:, :2] - lat[:, 2:4], axis=1)
            assert np.all(np.diff(d) < 0)


class TestWriteProbeDataset:
    def test_ego4d_layout_loads(self, tmp_path):
        root = write_probe_dataset(
            str(tmp_path / "d"), n_videos=3, n_frames=5, size=32, seed=1
        )
        import pandas as pd

        man = pd.read_csv(f"{root}/manifest.csv")
        assert len(man) == 3 and list(man.columns) == ["path", "len", "txt"]
        # captions follow the reference's "C <narration>" law (the loader
        # strips txt[2:], data_loaders.py:78) and use only vocab words
        vocab = set(open(f"{root}/vocab.txt").read().split())
        for _, row in man.iterrows():
            assert row["txt"].startswith("C ")
            assert set(row["txt"][2:].split()) <= vocab
        # frames are 1-based JPEGs of the declared length
        from PIL import Image

        img = Image.open(f"{man.iloc[0]['path']}/000001.jpg")
        assert img.size == (32, 32)
        assert not (
            tmp_path / "d" / "vid000" / "000000.jpg"
        ).exists()  # 1-based

    def test_dataset_feeds_training_sampler(self, tmp_path):
        import os

        from r3m_tpu.data.ego4d import Ego4DDataset

        root = write_probe_dataset(
            str(tmp_path / "d"), n_videos=3, n_frames=5, size=32, seed=1
        )
        ds = Ego4DDataset(root, seed=0)
        clip = ds.sample_clip()
        assert len(clip.paths) == 5
        assert all(os.path.exists(p) for p in clip.paths)
        assert clip.caption.startswith("person moves the block")


class TestLinearProbe:
    def test_recovers_linear_ground_truth(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(400, 32))
        w = rng.normal(size=(32, 2))
        target = emb @ w + 3.0
        groups = np.repeat(np.arange(20), 20)
        out = linear_probe(emb, target, groups=groups, seed=0)
        assert out["r2_mean"] > 0.99

    def test_noise_features_score_near_zero(self):
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(400, 32))
        target = rng.normal(size=(400, 2))  # independent of emb
        groups = np.repeat(np.arange(20), 20)
        out = linear_probe(emb, target, groups=groups, seed=0)
        assert out["r2_mean"] < 0.15  # no skill vs the train-mean baseline

    def test_group_constant_target_stays_finite(self):
        # the round-5 fix: per-video-constant targets (goal position) have
        # ~zero variance inside the val split; R² must baseline against
        # the train-mean predictor, not explode to -1e11
        rng = np.random.default_rng(2)
        groups = np.repeat(np.arange(8), 10)
        target = groups[:, None].astype(np.float64)  # constant per group
        emb = rng.normal(size=(80, 16))
        out = linear_probe(emb, target, groups=groups, seed=0)
        assert -10.0 < out["r2_mean"] <= 1.0


class TestRewardOrderAcc:
    def test_perfectly_ordered_embedding(self):
        # embedding = 1-D position approaching the goal monotonically
        t = np.linspace(0, 1, 10)[:, None]
        emb = np.tile(t, (1, 4))
        video = np.zeros(10, np.int32)
        assert reward_order_acc(emb, video) == 1.0

    def test_anti_ordered_embedding(self):
        t = np.linspace(0, 1, 10)[:, None]
        emb = np.tile(t, (1, 4))
        # moving AWAY from the final frame's position over time: flip the
        # trajectory but keep the goal frame at the end
        emb = np.concatenate([emb[-2::-1], emb[-1:]])
        video = np.zeros(10, np.int32)
        assert reward_order_acc(emb, video) == 0.0

    def test_averages_over_videos(self):
        t = np.linspace(0, 1, 6)[:, None]
        good = np.tile(t, (1, 3))
        bad = np.concatenate([good[-2::-1], good[-1:]])
        emb = np.concatenate([good, bad])
        video = np.repeat([0, 1], 6)
        assert reward_order_acc(emb, video) == pytest.approx(0.5)

    def test_collapsed_embedding_scores_chance_not_zero(self):
        """A constant (collapsed) embedding carries no order signal: every
        pair ties, and ties must read 0.5 (chance), not 0.0 'perfectly
        anti-ordered' (review finding — 0.0 would inflate trained-minus-
        random deltas for degenerate encoders)."""
        emb = np.ones((8, 4))
        video = np.zeros(8, np.int32)
        assert reward_order_acc(emb, video) == pytest.approx(0.5)

    def test_caption_contrast_oracle_scorer(self):
        """A scorer that recognizes the true caption from the embedding
        scores 1.0; one keyed to the WRONG caption scores 0.0; chance for
        an embedding-blind scorer is ~1/8."""
        from r3m_tpu.evalsuite.fixtures import (
            _DIRS,
            _dir_index,
            caption_contrast_acc,
            probe_captions,
        )

        rng = np.random.default_rng(0)
        v, d = 16, 8
        deltas = rng.normal(size=(v, 2))
        # embed the true direction index into feature 0
        e_first = rng.normal(size=(v, d))
        e_first[:, 0] = [_dir_index(x) for x in deltas]
        e_last = np.zeros((v, d))
        caps = probe_captions()

        def oracle(e0, es, sentences):
            return np.asarray(
                [1.0 if caps[int(a[0])] == s else 0.0
                 for a, s in zip(e0, sentences)]
            )

        assert caption_contrast_acc(oracle, e_first, e_last, deltas) == 1.0

        def wrong(e0, es, sentences):
            return np.asarray(
                [1.0 if caps[(int(a[0]) + 1) % len(caps)] == s else 0.0
                 for a, s in zip(e0, sentences)]
            )

        assert caption_contrast_acc(wrong, e_first, e_last, deltas) == 0.0

        def blind(e0, es, sentences):
            # constant preference for caption 0, independent of embeddings
            return np.asarray([1.0 if s == caps[0] else 0.0 for s in sentences])

        acc = caption_contrast_acc(blind, e_first, e_last, deltas)
        # equals the fraction of videos whose true direction is sector 0
        expect = float(np.mean([_dir_index(x) == 0 for x in deltas]))
        assert acc == pytest.approx(expect)
        assert len(_DIRS) == len(caps) == 8

    def test_short_videos_skipped_not_nan(self):
        """Videos with <3 frames have no ordered pair; they must be
        skipped, not poison the average with NaN."""
        t = np.linspace(0, 1, 6)[:, None]
        good = np.tile(t, (1, 3))
        emb = np.concatenate([good, np.zeros((2, 3))])
        video = np.concatenate([np.zeros(6, np.int32), np.ones(2, np.int32)])
        acc = reward_order_acc(emb, video)
        assert acc == 1.0  # only the orderable video counts
        with pytest.raises(ValueError, match="3 frames"):
            reward_order_acc(np.zeros((2, 3)), np.zeros(2, np.int32))
