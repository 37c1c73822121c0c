"""Native C++ prefetch pipeline: content parity, ordering, shutdown."""

import numpy as np
import pytest

from r3m_tpu.data.decoder import JpegDecoder, NativeFramePipeline
from r3m_tpu.data.ego4d import Ego4DDataset, FrameBatcher, write_synthetic_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_dataset(
        str(tmp_path_factory.mktemp("np_data")), n_videos=6, min_len=10,
        max_len=14, size=64,
    )


def _native_available():
    return JpegDecoder(64, 64).native


def test_native_pipeline_matches_frame_batcher(data_root):
    if not _native_available():
        pytest.skip("native decoder not built")
    # identical RNG seeds => identical path sequences => identical batches
    ds1 = Ego4DDataset(data_root, alpha=0.2, seed=7)
    ds2 = Ego4DDataset(data_root, alpha=0.2, seed=7)
    ref = FrameBatcher(ds1, batch_size=3, height=64, width=64, n_threads=2)
    pipe = NativeFramePipeline(ds2, batch_size=3, height=64, width=64,
                               n_threads=2, depth=2)
    try:
        for _ in range(5):  # several batches: exercises ring reuse + order
            c1, cap1 = ref.next_batch()
            c2, cap2 = pipe.next_batch()
            assert cap1 == cap2
            np.testing.assert_array_equal(c1, c2)
    finally:
        pipe.close()


def test_native_pipeline_missing_files_zero_filled(data_root, tmp_path):
    if not _native_available():
        pytest.skip("native decoder not built")

    class FakeDS:
        def sample_batch(self, bs):
            return [str(tmp_path / "missing.jpg")] * (bs * 5), [""] * bs

    pipe = NativeFramePipeline(FakeDS(), batch_size=2, height=64, width=64,
                               n_threads=2, depth=2)
    try:
        clips, caps = pipe.next_batch()
        assert clips.shape == (2, 5, 64, 64, 3)
        assert np.all(clips == 0)
    finally:
        pipe.close()


def test_native_pipeline_clean_shutdown_with_inflight(data_root):
    if not _native_available():
        pytest.skip("native decoder not built")
    ds = Ego4DDataset(data_root, alpha=0.2, seed=1)
    pipe = NativeFramePipeline(ds, batch_size=2, height=64, width=64,
                               n_threads=2, depth=3)
    pipe.close()  # close with 3 batches in flight, never fetched
    pipe.close()  # idempotent


def test_corrupt_and_oversized_header_jpegs_zero_filled(tmp_path):
    """Garbage bytes and a corrupt header declaring absurd dimensions must
    zero-fill (never crash/terminate the process or leak unbounded)."""
    if not _native_available():
        pytest.skip("native decoder not built")
    from PIL import Image

    good = tmp_path / "good.jpg"
    Image.fromarray(np.full((64, 64, 3), 200, np.uint8)).save(good)
    garbage = tmp_path / "garbage.jpg"
    garbage.write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 256)
    truncated = tmp_path / "trunc.jpg"
    truncated.write_bytes(good.read_bytes()[:120])  # valid header, cut body

    dec = JpegDecoder(64, 64, n_threads=2)
    batch = dec.decode_batch([str(garbage), str(good), str(truncated)] * 4)
    assert batch.shape == (12, 64, 64, 3)
    for i in range(12):
        if i % 3 == 1:
            assert batch[i].mean() > 100  # good frame decoded
        else:
            assert np.all(batch[i] == 0)  # failures zero-filled


def test_decode_batch_many_small_batches_no_race():
    """Stress the batch-completion handshake (historically racy: the caller
    could destroy the stack cv while the last worker still held it)."""
    if not _native_available():
        pytest.skip("native decoder not built")
    import tempfile

    from PIL import Image

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/f.jpg"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
        dec = JpegDecoder(8, 8, n_threads=4)
        for _ in range(300):  # tiny fast batches maximize the race window
            out = dec.decode_batch([p, p])
            assert out.shape == (2, 8, 8, 3)


def test_midscan_truncated_jpeg_fails_not_garbage(tmp_path):
    """A JPEG cut mid-entropy-data decodes 'successfully' in raw libjpeg
    (fake EOI warning, garbage bottom rows) — the decoder must treat the
    warning as failure and zero-fill, matching the PIL fallback."""
    if not _native_available():
        pytest.skip("native decoder not built")
    from PIL import Image

    rng = np.random.default_rng(0)
    good = tmp_path / "good.jpg"
    # noise compresses poorly -> long entropy stream, so a 60% cut lands
    # well inside the scan data (after the headers)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(
        good, quality=95
    )
    data = good.read_bytes()
    cut = tmp_path / "cut.jpg"
    cut.write_bytes(data[: int(len(data) * 0.6)])

    dec = JpegDecoder(64, 64, n_threads=1)
    batch = dec.decode_batch([str(good), str(cut)])
    assert batch[0].mean() > 10  # intact frame decodes
    assert np.all(batch[1] == 0)  # truncated frame rejected, zero-filled


def test_pipeline_rejects_degenerate_dims_and_closed_use(data_root):
    """batch_frames=0 would hang fetch/destroy forever; a fetch after
    close() would pass a NULL handle into C (SIGSEGV)."""
    if not _native_available():
        pytest.skip("native decoder not built")
    ds = Ego4DDataset(data_root, alpha=0.2, seed=1)
    with pytest.raises(ValueError, match="invalid pipeline dims"):
        NativeFramePipeline(ds, batch_size=0, height=64, width=64)

    pipe = NativeFramePipeline(ds, batch_size=1, height=64, width=64,
                               n_threads=1, depth=1)
    pipe.next_batch()
    pipe.close()
    with pytest.raises(RuntimeError, match="closed"):
        pipe.next_batch()
