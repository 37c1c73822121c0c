"""Data pipeline tests: sampling law, batching, async pipeline, e2e slice."""

import numpy as np
import pytest

import jax

from r3m_tpu.data.ego4d import Ego4DDataset, FrameBatcher, write_synthetic_dataset
from r3m_tpu.data.pipeline import DataPipeline
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.training.trainer import create_train_state, make_train_step


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ego4d")
    return write_synthetic_dataset(
        str(root), n_videos=6, min_len=10, max_len=20, size=64,
        captions=["C opens the door", "C picks up a cup", ""],
    )


def test_sampling_law(dataset_root):
    ds = Ego4DDataset(dataset_root, alpha=0.2, seed=0)
    for _ in range(200):
        vidlen = int(ds._lens[int(ds.rng.integers(0, len(ds)))])
        s, e, s0, s1, s2 = ds.sample_indices(vidlen)
        # bounds from data_loaders.py:75-79
        assert 1 <= s < 2 + int(0.2 * vidlen)
        assert max(int(0.8 * vidlen) - 1, 1) <= e < vidlen
        assert 2 <= s1 < vidlen
        assert 1 <= s0 < s1
        assert s1 <= s2 <= vidlen
    # caption "C " stripping
    clip = ds.sample_clip()
    assert not clip.caption.startswith("C ")
    assert len(clip.paths) == 5
    assert all(p.endswith(".jpg") for p in clip.paths)


def test_manifest_sharding(dataset_root):
    full = Ego4DDataset(dataset_root)
    a = Ego4DDataset(dataset_root, shard_index=0, num_shards=2)
    b = Ego4DDataset(dataset_root, shard_index=1, num_shards=2)
    assert len(a) + len(b) == len(full)
    assert set(a._paths).isdisjoint(set(b._paths))


def test_manifest_sharding_disjoint_and_covering(dataset_root):
    """Per-host manifest shards (ego4d.py shard_index/num_shards — the
    multi-host input path) must partition the full manifest: pairwise
    disjoint, jointly covering, and sized within one row of each other for
    every shard count, including counts that don't divide the manifest."""
    full = Ego4DDataset(dataset_root)
    all_paths = set(full._paths)
    for num_shards in (2, 3, len(full) - 1):
        shards = [
            Ego4DDataset(dataset_root, shard_index=i, num_shards=num_shards)
            for i in range(num_shards)
        ]
        seen = []
        for s in shards:
            seen.extend(s._paths)
        assert len(seen) == len(full)  # no duplicates across hosts
        assert set(seen) == all_paths  # nothing dropped
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) <= 1  # balanced host load

    # more hosts than manifest rows must fail identically on EVERY process
    # at construction (an empty shard would crash only the starved hosts'
    # producer threads while the rest hang in their first collective)
    with pytest.raises(ValueError, match="num_shards"):
        Ego4DDataset(dataset_root, shard_index=0, num_shards=len(full) + 1)


def test_frame_batcher_shapes(dataset_root):
    ds = Ego4DDataset(dataset_root, seed=1)
    fb = FrameBatcher(ds, batch_size=4, height=64, width=64)
    clips, captions = fb.next_batch()
    assert clips.shape == (4, 5, 64, 64, 3)
    assert clips.dtype == np.uint8
    assert clips.mean() > 10  # actually decoded, not zero-filled
    assert len(captions) == 4


@pytest.mark.slow
def test_pipeline_and_train_slice(dataset_root):
    """Minimum end-to-end training slice: synthetic data -> loss decreases."""
    from r3m_tpu.text.tokenizer import WordPieceTokenizer

    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "opens", "the", "door",
         "picks", "up", "a", "cup"])}
    tok = WordPieceTokenizer(vocab=vocab)

    ds = Ego4DDataset(dataset_root, seed=2)
    fb = FrameBatcher(ds, batch_size=4, height=64, width=64)
    cfg = R3MConfig(size=18, tcnweight=1.0, langweight=0.0, image_size=32)
    step = make_train_step(cfg, donate=False, doaug="rctraj")
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    with DataPipeline(fb, tokenizer=tok, lang_max_len=12, prefetch=2) as pipe:
        losses = []
        for _ in range(4):
            batch = next(pipe)
            assert batch["token_ids"].shape == (4, 12)
            batch.pop("captions")
            batch = {"images": batch["images"]}  # tcn-only slice
            state, metrics = step(state, batch)
            losses.append(float(metrics["full_loss"]))
    assert all(np.isfinite(losses))


def test_encoder_rejects_channels_last(rng):
    import jax
    import pytest

    from r3m_tpu.models.r3m import R3MConfig, R3MEncoder, r3m_init

    cfg = R3MConfig(size=18)
    state = r3m_init(jax.random.PRNGKey(0), cfg)
    enc = R3MEncoder(cfg, state["params"], state["batch_stats"])
    bad = rng.integers(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="channels-last"):
        enc(bad)


def test_manifest_short_videos_rejected(tmp_path):
    import pandas as pd
    import pytest

    from r3m_tpu.data.ego4d import Ego4DDataset

    pd.DataFrame(
        [{"path": "vid000", "len": 2, "txt": "C x"},
         {"path": "vid001", "len": 10, "txt": "C y"}]
    ).to_csv(tmp_path / "manifest.csv", index=False)
    with pytest.raises(ValueError, match="len < 3"):
        Ego4DDataset(str(tmp_path))


def test_decoder_resizes_oversized_frames(tmp_path):
    """Non-224 source frames go through the native DCT-downscale + box
    resize (or the PIL fallback) and land near the PIL reference."""
    from PIL import Image

    from r3m_tpu.data.decoder import JpegDecoder

    rng2 = np.random.default_rng(3)
    # smooth image => resize comparison is meaningful despite JPEG loss
    yy, xx = np.mgrid[0:448, 0:448].astype(np.float32) / 448
    img = np.stack(
        [127 + 100 * np.sin(4 * xx), 127 + 100 * np.cos(4 * yy),
         127 + 100 * np.sin(3 * (xx + yy))], axis=-1
    ).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / "big.jpg")
    Image.fromarray(img).save(p, quality=95)

    dec = JpegDecoder(224, 224)
    out = dec.decode_batch([p])
    assert out.shape == (1, 224, 224, 3)
    with Image.open(p) as im:
        ref = np.asarray(im.convert("RGB").resize((224, 224), Image.BOX))
    err = np.abs(out[0].astype(np.float32) - ref.astype(np.float32)).mean()
    assert err < 6.0, f"mean abs err {err}"


def test_nan_caption_becomes_empty(tmp_path):
    """A missing txt cell (pandas NaN) must yield caption "" (masked), not
    the junk caption "n" from str(nan)[2:]."""
    import pandas as pd
    from PIL import Image
    import os

    root = tmp_path / "nan_ds"
    vdir = root / "vid000"
    os.makedirs(vdir)
    for t in range(1, 6):
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(vdir / f"{t:06}.jpg")
    pd.DataFrame([{"path": str(vdir), "len": 5, "txt": None}]).to_csv(
        root / "manifest.csv", index=False
    )
    ds = Ego4DDataset(str(root), seed=0)
    assert ds.sample_clip().caption == ""


def test_pipeline_stops_after_close(dataset_root):
    """__next__ must not spin forever once the producer has exited."""
    ds = Ego4DDataset(dataset_root, seed=0)
    pipe = DataPipeline(FrameBatcher(ds, batch_size=2, height=64, width=64))
    next(pipe)  # producer alive and serving
    pipe.close()
    with pytest.raises((StopIteration, RuntimeError)):
        for _ in range(8):  # drain whatever close() left in the queue
            next(pipe)
