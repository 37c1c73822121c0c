"""Workspace/CLI integration: config loading, short training run, resume."""

import os

import numpy as np
import pytest

from r3m_tpu.data.ego4d import write_synthetic_dataset
from r3m_tpu.utils.config import load_config

pytestmark = pytest.mark.slow  # heavy integration tier; smoke runs use -m 'not slow'


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws_data")
    return write_synthetic_dataset(
        str(root), n_videos=4, min_len=10, max_len=16, size=64,
        captions=["C opens the door", "C picks up a cup"],
    )


def _base_cfg(dataset_root, tmp_path):
    return load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}",
            f"log_dir={tmp_path}",
            "batch_size=4",
            "train_steps=3",
            "eval_freq=2",
            "num_workers=2",
            "agent.size=18",
            "agent.langweight=0.0",
            "compute_dtype=float32",
            "n_devices=1",
        ],
    )


def test_missing_vocab_path_is_actionable(dataset_root, tmp_path):
    """langweight>0 without vocab_path must raise the explicit config error
    (not a bare KeyError from deep inside __init__), mirroring the
    bert_weights companion check."""
    from r3m_tpu.models.distilbert import DistilBertConfig, distilbert_init
    from r3m_tpu.checkpoint import save_snapshot
    from r3m_tpu.training.workspace import Workspace

    import jax

    import dataclasses

    bcfg = DistilBertConfig(vocab_size=50, dim=16, n_layers=1, n_heads=2,
                            hidden_dim=32, max_position_embeddings=16)
    bert = tmp_path / "bert.npz"
    save_snapshot(
        str(bert),
        distilbert_init(jax.random.PRNGKey(0), bcfg),
        meta={"bert_config": dataclasses.asdict(bcfg)},
    )
    cfg = _base_cfg(dataset_root, tmp_path)
    cfg["agent"]["langweight"] = 1.0
    cfg["bert_weights"] = str(bert)
    cfg["vocab_path"] = ""
    with pytest.raises(ValueError, match="vocab_path"):
        Workspace(cfg, work_dir=str(tmp_path / "novocab"))


def test_config_interpolation_and_overrides(dataset_root, tmp_path):
    cfg = _base_cfg(dataset_root, tmp_path)
    assert cfg.agent["lr"] == cfg["lr"]  # ${lr} interpolation
    assert cfg.agent["bs"] == 4  # ${batch_size} + override
    assert cfg.agent["size"] == 18
    assert cfg["train_steps"] == 3


def test_workspace_train_eval_snapshot_resume(dataset_root, tmp_path):
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "run1"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()
        assert ws.global_step == 3
    finally:
        ws.close()
    assert os.path.exists(work / "snapshot.npz")
    # CSVs follow the run dir: an explicit work_dir overrides cfg.log_dir so
    # logs and snapshots never diverge
    assert os.path.exists(work / "train.csv")
    # the honest wall-clock metric rides along (update_time is dispatch-only
    # under deferred metric readout; step_time is window wall / steps)
    import csv as _csv

    with open(work / "train.csv") as f:
        rows = list(_csv.DictReader(f))
    assert rows and "step_time" in rows[0]
    assert all(float(r["step_time"]) > 0 for r in rows)

    # auto-resume picks up global step (last snapshot was post-update step 3)
    ws2 = Workspace(cfg, work_dir=str(work))
    try:
        assert ws2.global_step == 3
        ws2.train()  # already at train_steps => no-op
        assert ws2.global_step == 3
    finally:
        ws2.close()


def test_workspace_multichip_mesh(dataset_root, tmp_path):
    """End-to-end training over the full 8-device dp mesh (and 2 slices)."""
    from r3m_tpu.training.workspace import Workspace

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}",
            f"log_dir={tmp_path}",
            "batch_size=8",
            "train_steps=2",
            "eval_freq=1000",
            "num_workers=2",
            "agent.size=18",
            "agent.langweight=0.0",
            "compute_dtype=float32",
            "n_devices=8",
            "n_slices=2",
            "snapshot=false",
        ],
    )
    ws = Workspace(cfg, work_dir=str(tmp_path))
    try:
        assert ws.mesh is not None and ws.mesh.devices.shape == (2, 4)
        ws.train()
        assert ws.global_step == 2
    finally:
        ws.close()


def test_elastic_resume_across_mesh_sizes(dataset_root, tmp_path):
    """A snapshot from a 1-device run resumes bit-identically on an
    8-device mesh, and that run's snapshot resumes back on 1 device.

    Preempted pods can come back at a different scale; because snapshots
    are canonical host arrays (checkpoint.canonicalize_train_tree), the
    mesh size at save time must leave no trace in the file. With
    agent.size=18 + adam this also round-trips the packed-BN layout
    through a mesh change (pack on load happens per-run, not per-file).
    """
    import jax

    from r3m_tpu.checkpoint import canonicalize_train_tree, load_snapshot
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "elastic"
    work.mkdir()

    def cfg_for(n_devices: int, train_steps: int, eval_freq: int):
        return load_config(
            os.path.join(
                os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"
            ),
            overrides=[
                f"datapath={dataset_root}",
                f"log_dir={work}",
                "batch_size=8",
                f"train_steps={train_steps}",
                f"eval_freq={eval_freq}",  # snapshots ride eval events
                "num_workers=2",
                "agent.size=18",
                "agent.langweight=0.0",
                "compute_dtype=float32",
                f"n_devices={n_devices}",
            ],
        )

    # eval (hence snapshot) fires at steps 1 and 3 — final step included
    ws = Workspace(cfg_for(1, 3, 2), work_dir=str(work))
    try:
        ws.train()
        assert ws.global_step == 3
    finally:
        ws.close()
    saved, meta = load_snapshot(str(work / "snapshot.npz"))
    assert meta["global_step"] == 3

    # resume on the full virtual 8-device mesh: exact restore, then 1 step
    ws2 = Workspace(cfg_for(8, 4, 1), work_dir=str(work))
    try:
        assert ws2.mesh is not None and ws2.mesh.devices.shape == (8,)
        assert ws2.global_step == 3
        restored = canonicalize_train_tree(
            {
                "params": ws2.state.params,
                "batch_stats": ws2.state.batch_stats,
                "opt_state": ws2.state.opt_state,
                "key": ws2.state.key,
            }
        )
        # container types differ (npz unflattens to dicts/lists, the live
        # state holds optax namedtuples) but leaf order is the alignment
        # restore_like itself relies on — compare leaves positionally
        leaves_a = jax.tree_util.tree_leaves(saved)
        leaves_b = jax.tree_util.tree_leaves(restored)
        assert len(leaves_a) == len(leaves_b)
        for i, (a, b) in enumerate(zip(leaves_a, leaves_b)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"leaf {i}"
            )
        ws2.train()
        assert ws2.global_step == 4
    finally:
        ws2.close()

    # and back down: the 8-device run's snapshot resumes on 1 device
    ws3 = Workspace(cfg_for(1, 4, 1), work_dir=str(work))
    try:
        assert ws3.global_step == 4
        for leaf in jax.tree_util.tree_leaves(ws3.state.params):
            assert np.all(np.isfinite(np.asarray(leaf)))
    finally:
        ws3.close()


def test_workspace_multihost_input_wiring(dataset_root, tmp_path, monkeypatch):
    """Mocked 2-process run: local batch slicing, manifest sharding, lead-only
    logging/snapshots."""
    import jax

    import r3m_tpu.training.workspace as ws_mod
    from r3m_tpu.training.workspace import Workspace

    monkeypatch.setattr(ws_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(ws_mod.jax, "process_index", lambda: 1)

    cfg = _base_cfg(dataset_root, tmp_path / "mh")
    ws = Workspace(cfg, work_dir=str(tmp_path / "mh"))
    try:
        # global batch 4 -> 2 per host; manifests disjointly sharded
        assert ws.train_pipe.batcher.batch_size == 2
        assert len(ws.train_pipe.batcher.dataset) == 2  # 4 videos / 2 hosts
        # non-lead host: logger no-ops, no CSV files created
        assert ws.is_lead is False
        ws.logger.log_metrics({"full_loss": 1.0}, 0, ty="train")
        ws.logger.dump(0, ty="train")
        assert not os.path.exists(tmp_path / "mh" / "train.csv")
    finally:
        ws.close()

    # batch_size not divisible by hosts -> clear error
    import pytest as _pytest

    bad = _base_cfg(dataset_root, tmp_path / "mh2")
    bad["batch_size"] = 5
    bad.agent["bs"] = 5
    with _pytest.raises(ValueError, match="not divisible"):
        Workspace(bad, work_dir=str(tmp_path / "mh2"))


def test_workspace_language_training_to_reward_model(dataset_root, tmp_path):
    """Integration: lang-loss training -> snapshot -> reward-model serving."""
    import jax

    from r3m_tpu.checkpoint import save_snapshot
    from r3m_tpu.models.distilbert import distilbert_init
    from r3m_tpu.reward import R3MRewardModel
    from r3m_tpu.training.workspace import Workspace

    lang = tmp_path / "lang"
    lang.mkdir()
    save_snapshot(str(lang / "bert.npz"), distilbert_init(jax.random.PRNGKey(9)))
    (lang / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "c", "opens", "the",
                   "door", "picks", "up", "a", "cup"]) + "\n"
    )
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}",
            f"log_dir={tmp_path}",
            "batch_size=2",
            "train_steps=2",
            "eval_freq=1",
            "num_workers=2",
            "agent.size=18",
            "agent.langweight=1.0",
            "compute_dtype=float32",
            "n_devices=1",
            f"bert_weights={lang/'bert.npz'}",
            f"vocab_path={lang/'vocab.txt'}",
            "compilation_cache_dir=",
        ],
    )
    ws = Workspace(cfg, work_dir=str(tmp_path))
    try:
        ws.train()
    finally:
        ws.close()

    rm = R3MRewardModel.from_snapshot(
        str(tmp_path / "snapshot.npz"), str(lang / "bert.npz"),
        str(lang / "vocab.txt"),
    )
    im = np.zeros((1, 3, 64, 64), np.float32) + 127
    r = rm(im, im + 10, ["picks up a cup"])
    assert r.shape == (1,) and np.isfinite(float(r[0]))


def test_resume_falls_back_on_corrupt_rolling_snapshot(dataset_root, tmp_path):
    """A truncated rolling snapshot must not kill auto-resume."""
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "crash"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()  # 3 steps, snapshots at eval steps
    finally:
        ws.close()
    assert os.path.exists(work / "snapshot.npz")
    # simulate a crash mid-write: truncate the rolling file
    with open(work / "snapshot.npz", "wb") as f:
        f.write(b"\x00" * 100)

    ws2 = Workspace(cfg, work_dir=str(work))
    try:
        assert ws2.global_step > 0  # recovered from snapshot_{step}.npz
    finally:
        ws2.close()


def test_config_override_typo_rejected(dataset_root, tmp_path):
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"
    )
    import pytest as _pytest

    with _pytest.raises(KeyError, match="batch_sise"):
        load_config(cfg_path, overrides=["batch_sise=4"])
    # explicit additions are allowed with '+'
    cfg = load_config(cfg_path, overrides=["+my_extra=7"])
    assert cfg["my_extra"] == 7


def test_cli_requeue_on_crash(dataset_root, tmp_path, monkeypatch):
    """--retries relaunches the workspace after a crash (submitit-requeue
    role); auto-resume then continues from the snapshot."""
    import train_representation as tr
    from r3m_tpu.training import workspace as ws_mod

    calls = {"n": 0}
    orig_train = ws_mod.Workspace.train

    def flaky_train(self):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash")
        return orig_train(self)

    monkeypatch.setattr(ws_mod.Workspace, "train", flaky_train)
    tr.main([
        f"datapath={dataset_root}", f"log_dir={tmp_path/'rq'}",
        "batch_size=2", "train_steps=1", "eval_freq=1000", "num_workers=2",
        "agent.size=18", "agent.langweight=0.0", "compute_dtype=float32",
        "n_devices=1", "snapshot=false", "compilation_cache_dir=",
        "--retries=2",
    ])
    assert calls["n"] == 2


def test_snapshot_retention(dataset_root, tmp_path):
    """keep_snapshots prunes old per-step snapshots; rolling one stays."""
    from r3m_tpu.training.workspace import Workspace

    cfg = _base_cfg(dataset_root, tmp_path)
    cfg["keep_snapshots"] = 1
    cfg["eval_freq"] = 1  # snapshot at every step: 3 per-step snapshots
    work = tmp_path / "ret"
    work.mkdir()
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()
    finally:
        ws.close()
    import glob

    per_step = sorted(glob.glob(str(work / "snapshot_*.npz")))
    assert len(per_step) == 1  # only the newest kept
    assert per_step[0].endswith("snapshot_3.npz")
    assert os.path.exists(work / "snapshot.npz")


def test_profile_trace_closed_when_training_ends_early(dataset_root, tmp_path):
    """A capture window extending past train_steps must still stop the trace
    (data written, profiler session closed for later runs)."""
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "prof_run"
    work.mkdir()
    prof = tmp_path / "prof_trace"
    cfg = _base_cfg(dataset_root, tmp_path)
    cfg["train_steps"] = 12  # window is steps [10, 15) -> loop ends inside it
    cfg["eval_freq"] = 100
    cfg["profile_dir"] = str(prof)
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()
    finally:
        ws.close()
    import glob

    assert glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
    # session is closed: a fresh trace can start without "already active"
    import jax

    jax.profiler.start_trace(str(tmp_path / "t2"))
    jax.profiler.stop_trace()


class _PrefetchHarness:
    """Minimal Workspace stand-in for exercising _device_prefetch."""

    def __init__(self):
        self.mesh = None
        self.placed = 0

    def _place(self, batch):
        self.placed += 1
        return batch

    _device_prefetch = __import__(
        "r3m_tpu.training.workspace", fromlist=["Workspace"]
    ).Workspace._device_prefetch


def test_device_prefetch_depth_zero_disables_thread():
    import threading

    ws = _PrefetchHarness()
    before = threading.active_count()
    gen = ws._device_prefetch(iter([{"x": 1}, {"x": 2}]), depth=0)
    assert [b["x"] for b in gen] == [1, 2]
    assert ws.placed == 2
    assert threading.active_count() == before  # inline path, no producer


def test_device_prefetch_bounds_resident_batches():
    import itertools
    import time

    ws = _PrefetchHarness()
    gen = ws._device_prefetch(({"i": i} for i in itertools.count()), depth=2)
    first = next(gen)
    assert first["i"] == 0
    deadline = time.time() + 2.0
    while ws.placed < 3 and time.time() < deadline:
        time.sleep(0.01)
    time.sleep(0.3)  # producer must now be parked on q.full()
    # 1 yielded + exactly `depth` in the queue; never depth+1 resident
    assert ws.placed == 3
    gen.close()


def test_device_prefetch_surfaces_producer_error_and_clean_end():
    ws = _PrefetchHarness()

    def bad_pipe():
        yield {"ok": True}
        raise OSError("decode failed")

    gen = ws._device_prefetch(bad_pipe(), depth=2)
    assert next(gen)["ok"]
    with pytest.raises(RuntimeError, match="device prefetch"):
        for _ in gen:
            pass

    ws2 = _PrefetchHarness()
    gen2 = ws2._device_prefetch(iter([{"a": 1}]), depth=2)
    assert [b["a"] for b in gen2] == [1]  # finite pipe ends without error


def test_graceful_stop_writes_final_snapshot(dataset_root, tmp_path):
    """request_stop (the SIGTERM path) ends the loop after the current step
    and writes a final snapshot for requeue auto-resume."""
    import signal

    import train_representation as tr
    from r3m_tpu.checkpoint import load_snapshot
    from r3m_tpu.training.workspace import Workspace

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "cfgs", "config_rep.yaml"),
        overrides=[
            f"datapath={dataset_root}", f"log_dir={tmp_path}",
            "batch_size=2", "train_steps=50", "eval_freq=1000",
            "num_workers=2", "agent.size=18", "agent.langweight=0.0",
            "compute_dtype=float32", "n_devices=1", "metric_flush=1",
            "compilation_cache_dir=",
        ],
    )
    ws = Workspace(cfg)
    # the real wiring: SIGTERM -> request_stop
    tr._install_sigterm(ws)
    os.kill(os.getpid(), signal.SIGTERM)
    assert ws._stop_requested  # handler ran at the next bytecode boundary

    ws._stop_requested = False  # now stop from inside the loop instead
    orig_flush = ws._flush_train_metrics

    def hook(pending, win_t0=None):
        orig_flush(pending, win_t0)
        if ws.global_step >= 3:
            ws.request_stop()

    ws._flush_train_metrics = hook
    ws.train()
    ws.close()
    assert 3 <= ws.global_step < 50  # stopped early, after a full step
    _, meta = load_snapshot(str(tmp_path / "snapshot.npz"))
    assert meta["global_step"] == ws.global_step


def test_non_lead_process_writes_nothing(dataset_root, tmp_path, monkeypatch):
    """Multi-host discipline: only process 0 touches shared storage. A
    non-lead workspace (jax.process_index() != 0) must train without
    writing CSVs, snapshots, or metric prints to the run dir — otherwise
    N hosts interleave writes to the same files on shared filesystems
    (workspace.py is_lead branches)."""
    import jax

    from r3m_tpu.training.workspace import Workspace

    monkeypatch.setattr(jax, "process_index", lambda backend=None: 1)
    work = tmp_path / "follower"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    ws = Workspace(cfg, work_dir=str(work))
    try:
        assert ws.is_lead is False
        ws.train()
        assert ws.global_step == 3  # the step itself still runs
    finally:
        ws.close()
    leftovers = [p for p in os.listdir(work)]
    assert leftovers == [], f"non-lead process wrote: {leftovers}"


def test_skip_batches_replays_exact_stream(dataset_root):
    """Ego4DDataset.skip_batches(n) must leave the RNG exactly where
    drawing n batches would have (reproducible resume, VERDICT r4 item 4)."""
    from r3m_tpu.data.ego4d import Ego4DDataset

    bs = 4
    ref = Ego4DDataset(dataset_root, alpha=0.2, seed=11)
    stream = [ref.sample_batch(bs) for _ in range(10)]

    resumed = Ego4DDataset(dataset_root, alpha=0.2, seed=11)
    resumed.skip_batches(6, bs)
    for k in range(6, 10):
        assert resumed.sample_batch(bs) == stream[k], f"batch {k} diverged"


def test_reproducible_resume_matches_uninterrupted_run(dataset_root, tmp_path):
    """Train 3 steps -> snapshot -> resume -> train to 6 must produce the
    SAME final parameters as an uninterrupted 6-step run: the resumed
    workspace fast-forwards the host dataset RNGs, so the sample stream is
    identical (the reference silently changes the stream on requeue)."""
    import jax
    import numpy as np

    from r3m_tpu.training.workspace import Workspace

    def run(work, train_steps):
        cfg = _base_cfg(dataset_root, tmp_path)
        cfg["train_steps"] = train_steps
        ws = Workspace(cfg, work_dir=str(work))
        try:
            ws.train()
            state = jax.device_get(ws.state)
        finally:
            ws.close()
        return ws, state

    interrupted = tmp_path / "interrupted"
    interrupted.mkdir()
    _, _ = run(interrupted, 3)  # phase A: stops at 3, snapshot.npz written
    ws_b, state_b = run(interrupted, 6)  # phase B: auto-resume 3 -> 6
    assert int(np.asarray(state_b.step)) == 6
    assert ws_b._train_stream_pos0 == 3  # the fast-forward actually applied

    straight = tmp_path / "straight"
    straight.mkdir()
    _, state_c = run(straight, 6)

    for a, c in zip(
        jax.tree_util.tree_leaves(state_b.params),
        jax.tree_util.tree_leaves(state_c.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(
        jax.tree_util.tree_leaves(state_b.batch_stats),
        jax.tree_util.tree_leaves(state_c.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_resume_stream_restarts_on_dataset_identity_change(
    dataset_root, tmp_path
):
    """Stream counters must NOT transfer when the dataset identity changed
    (review finding): skip_batches replays draws whose bounds come from
    the manifest lens/alpha/seed, so fast-forwarding against a different
    stream would match neither the interrupted nor a fresh run while
    printing 'bit-reproducible continuation'."""
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "fpwork"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    cfg["train_steps"] = 2
    cfg["eval_freq"] = 1
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()
    finally:
        ws.close()

    # same dataset identity -> counters transfer
    ws2 = Workspace(cfg, work_dir=str(work))
    try:
        assert ws2._train_stream_pos0 == 2
    finally:
        ws2.close()

    # changed alpha -> different draw bounds -> stream restarts from seed
    cfg_b = _base_cfg(dataset_root, tmp_path)
    cfg_b["train_steps"] = 2
    cfg_b["eval_freq"] = 1
    cfg_b["alpha"] = 0.4
    ws3 = Workspace(cfg_b, work_dir=str(work))
    try:
        assert ws3._train_stream_pos0 == 0
    finally:
        ws3.close()


def test_eval_batches_knob(dataset_root, tmp_path):
    """eval_batches=N draws N val batches per eval event and averages the
    metrics (VERDICT r4 item 7); N=1 stays the reference single-batch law."""
    from r3m_tpu.training.workspace import Workspace

    work = tmp_path / "evalN"
    work.mkdir()
    cfg = _base_cfg(dataset_root, tmp_path)
    cfg["eval_batches"] = 3
    ws = Workspace(cfg, work_dir=str(work))
    try:
        ws.train()  # 3 steps, eval events at steps 1 and 3
        assert ws._val_batches == 2 * 3  # 2 events x 3 batches
    finally:
        ws.close()
    assert os.path.exists(work / "eval.csv")
