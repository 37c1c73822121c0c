"""Training workspace: wiring of data, model, mesh, logging, snapshots.

Counterpart of the reference's `Workspace` + Hydra `main`
(``/root/reference/r3m/train_representation.py:33-150``): seeds
everything, builds train/val input pipelines (val: alpha=0, no aug —
:51-52), instantiates the model from the config's ``agent`` node, runs the
`Until(train_steps)` loop with `Every(eval_freq)` eval + snapshotting and
metric prints every 10 steps, and auto-resumes from ``snapshot.npz``.

TPU specifics: the model trains under a data-parallel mesh when more than
one device is visible (ICI collectives via GSPMD), batches stream through
the async host pipeline into device HBM, and the whole update is one jit.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from r3m_tpu.checkpoint import (
    AsyncSnapshotWriter,
    import_torch_snapshot_to_state,
    load_snapshot,
    load_train_snapshot,
    save_train_snapshot,
    step_snapshots,
)
from r3m_tpu.data.ego4d import Ego4DDataset, FrameBatcher
from r3m_tpu.data.pipeline import DataPipeline
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.parallel.mesh import (
    make_mesh,
    place_host_batch,
    replicate,
)
from r3m_tpu.training.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from r3m_tpu.utils.config import Config, agent_to_r3m_config
from r3m_tpu.utils.logger import Logger
from r3m_tpu.utils.misc import Every, Timer, Until, set_seed_everywhere


def load_bert_params(path: str):
    """Load frozen DistilBERT weights: .npz snapshot or HF torch state dict.

    Returns ``(params, DistilBertConfig)``. The architecture comes from the
    snapshot's ``bert_config`` metadata (written by prepare_language) when
    present, else is inferred from the weight shapes (n_heads falls back to
    distilbert-base's 12 — the only field shapes can't determine)."""
    from r3m_tpu.models.distilbert import (
        DistilBertConfig,
        config_from_params,
        convert_distilbert,
        distilbert_config_from_state,
    )

    if path.endswith(".npz"):
        tree, meta = load_snapshot(path)
        if meta.get("bert_config"):
            return tree, DistilBertConfig(**meta["bert_config"])
        return tree, config_from_params(tree)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    cfg = distilbert_config_from_state(sd)
    return convert_distilbert(sd, cfg), cfg


class Workspace:
    def __init__(self, cfg: Config, work_dir: Optional[str] = None):
        self.work_dir = work_dir or cfg.get("log_dir") or os.getcwd()
        print(f"workspace: {self.work_dir}")
        self.cfg = cfg
        cache_dir = cfg.get("compilation_cache_dir")
        if cache_dir:
            # persistent XLA compilation cache: restarts/resumes skip the
            # (tens of seconds) train-step compile
            jax.config.update("jax_compilation_cache_dir", os.path.expanduser(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        self.key = set_seed_everywhere(int(cfg.get("seed", 1)))
        # Multi-host: only the lead process touches shared storage (snapshot
        # files, CSV/wandb sinks) — others would interleave writes to the
        # same paths on a shared filesystem.
        self.is_lead = jax.process_index() == 0
        self.logger = Logger(
            # work_dir already folds in cfg.log_dir; honoring an explicitly
            # passed work_dir keeps CSVs and snapshots in the same run dir
            self.work_dir,
            use_tb=bool(cfg.get("use_tb", False)) and self.is_lead,
            use_wandb=bool(cfg.get("use_wandb", False)) and self.is_lead,
            cfg=dict(cfg),
            enabled=self.is_lead,
        )

        # ---- model config -------------------------------------------------
        mcfg = agent_to_r3m_config(cfg["agent"])
        if cfg.get("compute_dtype"):
            import dataclasses

            mcfg = dataclasses.replace(mcfg, compute_dtype=cfg["compute_dtype"])
        self.model_cfg: R3MConfig = mcfg

        # ---- language stack ----------------------------------------------
        self.bert_params = None
        self.bert_cfg = None
        self.tokenizer = None
        if self.model_cfg.langweight > 0:
            if not cfg.get("bert_weights"):
                raise ValueError("agent.langweight > 0 requires cfg.bert_weights")
            bert_params, self.bert_cfg = load_bert_params(cfg["bert_weights"])
            # device-coerce ONCE so the train and eval steps share the same
            # frozen-BERT buffers instead of each making a copy
            self.bert_params = jax.tree_util.tree_map(jnp.asarray, bert_params)
            if self.bert_cfg.dim != self.model_cfg.lang_dim:
                # custom-geometry DistilBERT: size the reward head's
                # sentence-embedding input to the loaded encoder
                import dataclasses

                self.model_cfg = dataclasses.replace(
                    self.model_cfg, lang_dim=self.bert_cfg.dim
                )
            from r3m_tpu.text.tokenizer import WordPieceTokenizer

            if not cfg.get("vocab_path"):
                raise ValueError(
                    "agent.langweight > 0 requires cfg.vocab_path (the "
                    "WordPiece vocab companion of bert_weights; both are "
                    "written by `python -m r3m_tpu.prepare_language`)"
                )
            self.tokenizer = WordPieceTokenizer(vocab_file=cfg["vocab_path"])

        # ---- data ---------------------------------------------------------
        if cfg.get("dataset", "ego4d") != "ego4d":
            raise NameError("Invalid Dataset")
        bs = int(cfg.get("batch_size", 32))  # GLOBAL batch size
        n_threads = int(cfg.get("num_workers", 8))
        # Multi-host SPMD: each process feeds its shard of the global batch
        # from a disjoint manifest shard (decorrelated seeds per host).
        n_proc, proc = jax.process_count(), jax.process_index()
        if bs % n_proc:
            raise ValueError(f"batch_size={bs} not divisible by {n_proc} hosts")
        local_bs = bs // n_proc
        print("Creating Dataloader")
        train_ds = Ego4DDataset(
            cfg["datapath"], alpha=float(cfg.get("alpha", 0.2)),
            seed=int(cfg.get("seed", 1)) + proc,
            shard_index=proc, num_shards=n_proc,
        )
        val_ds = Ego4DDataset(
            cfg["datapath"], alpha=0.0,
            seed=int(cfg.get("seed", 1)) + 1 + proc,
            shard_index=proc, num_shards=n_proc,
        )
        def make_batcher(ds):
            if bool(cfg.get("native_pipeline", True)):
                try:
                    from r3m_tpu.data.decoder import NativeFramePipeline

                    return NativeFramePipeline(ds, local_bs, n_threads=n_threads)
                except RuntimeError as e:  # .so not built — Python fallback
                    print(f"[data] native pipeline unavailable ({e})")
            return FrameBatcher(ds, local_bs, n_threads=n_threads)

        # Pipelines are built AFTER the resume block below: their producer
        # threads start drawing from the dataset RNGs immediately, and a
        # resumed run must fast-forward those RNGs first (reproducible
        # resume) — building them here would race the replay.
        self._train_ds, self._val_ds = train_ds, val_ds
        self._make_batcher = make_batcher
        self._local_bs, self._n_proc = local_bs, n_proc

        # ---- mesh + steps ---------------------------------------------------
        n_dev = cfg.get("n_devices") or len(jax.devices())
        n_slices = int(cfg.get("n_slices", 1))
        self.mesh = (
            make_mesh(n_dev, n_slices=n_slices) if n_dev > 1 else None
        )
        doaug = str(cfg.get("doaug", "none"))
        if doaug in ("0", "False", "None"):
            doaug = "none"
        print("Initializing Model")
        if self.bert_params is not None and self.mesh is not None:
            # replicate the frozen BERT ONCE; place_bert_params is
            # idempotent, so the train and eval step builders below see
            # already-placed leaves and share these buffers instead of
            # each device_put-ing a ~265 MB replica
            from r3m_tpu.training.trainer import place_bert_params

            self.bert_params = place_bert_params(self.bert_params, self.mesh)
        self.train_step = make_train_step(
            self.model_cfg, bert_params=self.bert_params, mesh=self.mesh,
            doaug=doaug, grad_accum=int(cfg.get("grad_accum", 1) or 1),
            bert_cfg=self.bert_cfg,
        )
        self.eval_step = make_eval_step(
            self.model_cfg, bert_params=self.bert_params, mesh=self.mesh,
            bert_cfg=self.bert_cfg,
        )
        self.state = create_train_state(self.model_cfg, self.key)

        self.timer = Timer()

        # ---- resume ---------------------------------------------------------
        # (the snapshot loaders only use self.state as a host-side
        # shape/dtype template, so mesh replication waits until after)
        resume_meta: Dict = {}
        if cfg.get("load_snap"):
            print("LOADING", cfg["load_snap"])
            if str(cfg["load_snap"]).endswith(".pt"):
                self.state = import_torch_snapshot_to_state(
                    cfg["load_snap"], self.state
                )
            else:
                self.state, resume_meta = load_train_snapshot(
                    cfg["load_snap"], self.state, with_meta=True
                )
        else:
            self.state, resume_meta = self._auto_resume(self.state)
        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)

        # ---- data stream resume + pipelines ---------------------------------
        # Fast-forward the host dataset RNGs to where the interrupted run's
        # stream stood, so preempt+resume replays the exact sample sequence
        # of an uninterrupted run (the reference re-seeds its workers on
        # requeue and silently changes the stream). Counters are stored per
        # LOCAL stream: they only transfer across runs with the same host
        # count and per-host batch size — otherwise the stream restarts
        # from seed (printed, not silent).
        loaded_step = int(np.asarray(self.state.step))
        self._step0 = loaded_step
        self._train_stream_pos0 = 0  # batches already drawn from train_ds's RNG
        self._val_batches = 0  # val-stream position (batches drawn)
        ds_meta = (resume_meta or {}).get("data_stream") or {}
        # stream identity, not just shape: counters taken against a
        # different manifest/alpha/seed would fast-forward through the
        # WRONG draw bounds (e.g. a grown corpus, or a load_snap warm-start
        # from another run) while claiming bit-reproducibility
        self._stream_fp = {
            "train": train_ds.stream_fingerprint(),
            "val": val_ds.stream_fingerprint(),
        }
        if loaded_step > 0 and bool(cfg.get("resume_data_stream", True)):
            if (
                ds_meta.get("local_batch_size") == local_bs
                and ds_meta.get("num_hosts") == n_proc
                and ds_meta.get("stream_fp") == self._stream_fp
            ):
                t_n = int(ds_meta.get("train_batches", 0))
                v_n = int(ds_meta.get("val_batches", 0))
                train_ds.skip_batches(t_n, local_bs)
                val_ds.skip_batches(v_n, local_bs)
                self._train_stream_pos0 = t_n
                self._val_batches = v_n
                print(
                    f"[resume] data stream fast-forwarded: train {t_n} / "
                    f"val {v_n} batches (bit-reproducible continuation)"
                )
            elif ds_meta:
                why = (
                    "a different dataset/alpha/seed"
                    if ds_meta.get("stream_fp") not in (None, self._stream_fp)
                    else f"{ds_meta.get('num_hosts')} hosts x local batch "
                    f"{ds_meta.get('local_batch_size')} (this run: {n_proc} x "
                    f"{local_bs})"
                    if "stream_fp" in ds_meta
                    else "a pre-fingerprint snapshot (stream identity "
                    "unverifiable)"
                )
                print(
                    "[resume] snapshot data-stream counters were taken "
                    f"against {why} — stream restarts from seed"
                )
            else:
                print(
                    "[resume] snapshot has no data-stream counters; "
                    "stream restarts from seed"
                )
        lml = int(cfg.get("lang_max_len", 32))
        self.train_pipe = DataPipeline(
            make_batcher(train_ds), tokenizer=self.tokenizer, lang_max_len=lml
        )
        self.val_pipe = DataPipeline(
            make_batcher(val_ds), tokenizer=self.tokenizer, lang_max_len=lml
        )
        self._host_step = None  # lazily synced from device, then host-tracked
        # snapshot writes overlap training (sync device->host copy only);
        # async_snapshot=false restores fully blocking saves
        self._snap_writer = (
            AsyncSnapshotWriter()
            if bool(cfg.get("async_snapshot", True))
            else None
        )
        self._stop_requested = False

    # ------------------------------------------------------------------
    def _auto_resume(self, state):
        """Resume from the rolling snapshot; on a corrupt/truncated file
        (host killed mid-eval before the atomic rename, disk hiccup) fall
        back to the newest per-step snapshot instead of crashing.
        Returns ``(state, meta)`` — meta is {} on a fresh start.
        """
        candidates = []
        rolling = os.path.join(self.work_dir, "snapshot.npz")
        if os.path.exists(rolling):
            candidates.append(rolling)
        candidates.extend(p for _, p in step_snapshots(self.work_dir))
        for path in candidates:
            try:
                print(f"resuming: {path}")
                return load_train_snapshot(path, state, with_meta=True)
            except Exception as e:
                print(f"[resume] {path} unusable ({type(e).__name__}: {e})")
        return state, {}

    def request_stop(self):
        """Ask the training loop to stop after the current step.

        Signal-handler safe (sets a flag). Preemption path: the CLI wires
        SIGTERM here, so an evicted job finishes its step, writes a final
        snapshot, and exits cleanly for auto-resume on requeue — the
        reference loses up to eval_freq=20k steps of work on eviction.
        """
        self._stop_requested = True

    @property
    def global_step(self) -> int:
        """Host-mirrored step counter (no device round-trip in the hot loop)."""
        if self._host_step is None:
            self._host_step = int(np.asarray(self.state.step))
        return self._host_step

    def _place(self, batch: Dict) -> Dict:
        batch = {k: v for k, v in batch.items() if k != "captions"}
        # multihost => each host contributes its local slice of the global
        # batch (tested single-process via place_host_batch(multihost=True))
        return place_host_batch(self.mesh, batch)

    def _device_prefetch(self, pipe, depth: int = 2):
        """Generator: host batches placed onto the device up to N steps ahead.

        The host->device transfer can block (slowest on tunneled/remote
        devices, where a 24 MB uint8 batch dominated the measured step) —
        running `_place` in a side thread overlaps it with the device step
        instead of paying it inside the training loop's sample time.

        At most `depth` placed batches exist at once (the producer waits
        for queue space BEFORE placing, so HBM headroom can be sized to
        exactly N batches). `depth <= 0` disables prefetching entirely.
        """
        if depth <= 0:
            for batch in pipe:
                yield self._place(batch)
            return

        from r3m_tpu.data.pipeline import ProducerQueue

        # reserve_first: HBM is reserved (queue space) BEFORE placing, so
        # at most `depth` placed batches are ever resident
        pq = ProducerQueue(
            pipe,
            maxsize=depth,
            transform=self._place,
            reserve_first=True,
            name="device prefetch",
        )
        try:
            yield from pq
        finally:
            pq.close()

    def train(self):
        cfg = self.cfg
        until = Until(cfg.get("train_steps", 2_000_000))
        every = Every(cfg.get("eval_freq", 20_000))
        print("Begin Training")
        # Deferred metric readout: per-step metrics stay on device (tiny
        # scalar dicts) and are flushed in ONE batched device_get every
        # `metric_flush` steps, after later steps have been dispatched. The
        # host never blocks on per-scalar D2H round-trips (expensive on
        # tunneled TPUs) and the device pipeline stays deep.
        flush_n = int(cfg.get("metric_flush", 10))
        placed_batches = self._device_prefetch(
            self.train_pipe, depth=int(cfg.get("device_prefetch", 2))
        )
        try:
            self._train_loop(placed_batches, until, every, flush_n)
        finally:
            # deterministic prefetch shutdown (don't rely on GC closing the
            # generator) — releases the producer thread + its HBM batches
            placed_batches.close()
        if (
            self._stop_requested
            and self.is_lead
            and cfg.get("snapshot", True)
            and self.global_step > 0
        ):
            print(f"[workspace] stop requested — snapshot at step {self.global_step}")
            self.save_snapshot()
        if self._snap_writer is not None:
            self._snap_writer.wait()  # all snapshots durable before return

    def _train_loop(self, placed_batches, until, every, flush_n):
        cfg = self.cfg
        prof_dir = cfg.get("profile_dir") or ""
        # trace steps [resume+10, resume+10+profile_steps) — relative, so
        # resumed runs (load_snap / auto-resume) still capture a trace
        prof_start = self.global_step + 10
        prof_n = int(cfg.get("profile_steps", 5))
        prof_active = False
        pending = []  # [(step, device metrics dict, sample_s, update_s)]
        win_t0 = time.time()  # window wall clock -> true per-step time
        while until(self.global_step) and not self._stop_requested:
            if prof_dir and not prof_active and self.global_step == prof_start:
                jax.profiler.start_trace(prof_dir)
                prof_active = True
            t0 = time.time()
            batch = next(placed_batches)
            t1 = time.time()
            self.state, metrics = self.train_step(self.state, batch)
            self._host_step += 1
            t2 = time.time()
            step = self.global_step
            pending.append((step, metrics, t1 - t0, t2 - t1))
            if prof_active and step >= prof_start + prof_n:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                prof_active = False
                prof_dir = ""  # one capture per run
                print(f"profile trace written: {cfg.get('profile_dir')}")
            if len(pending) >= flush_n:
                self._flush_train_metrics(pending, win_t0)
                pending = []
                win_t0 = time.time()

            if every(step - 1):
                self._flush_train_metrics(pending, win_t0)
                pending = []
                win_t0 = time.time()
                # eval_batches=N averages N val batches per eval event —
                # the reference scores a single batch per event
                # (train_representation.py:114-117), which at eval_freq=2e4
                # is a noisy signal; default stays 1 for parity.
                n_eval = max(1, int(cfg.get("eval_batches", 1) or 1))
                base_key = jax.random.fold_in(jax.random.PRNGKey(0), step)
                acc: Dict[str, float] = {}
                for i in range(n_eval):
                    eval_batch = self._place(next(self.val_pipe))
                    self._val_batches += 1
                    # i=0 reproduces the pre-knob key exactly
                    ekey = base_key if i == 0 else jax.random.fold_in(base_key, i)
                    if self.mesh is not None:
                        ekey = jax.device_put(
                            ekey, jax.sharding.NamedSharding(
                                self.mesh, jax.sharding.PartitionSpec()))
                    em = self.eval_step(self.state, eval_batch, ekey)
                    for k, v in jax.device_get(em).items():
                        acc[k] = acc.get(k, 0.0) + float(v)
                emetrics = {k: v / n_eval for k, v in acc.items()}
                self.logger.log_metrics(emetrics, step, ty="eval")
                self.logger.dump(step, ty="eval")
                print("EVAL", step, emetrics)
                if cfg.get("snapshot", True) and self.is_lead:
                    self.save_snapshot()
                win_t0 = time.time()  # don't bill eval/snapshot to steps
        if prof_active:
            # training ended inside the capture window — close the trace so
            # the data is written and the profiler session isn't left open
            self.state = jax.block_until_ready(self.state)
            jax.profiler.stop_trace()
            print(f"profile trace written: {cfg.get('profile_dir')}")
        self._flush_train_metrics(pending, win_t0)
        self.logger.dump(self.global_step)

    def _flush_train_metrics(self, pending, win_t0=None):
        """One batched D2H fetch for a window of per-step metric dicts."""
        if not pending:
            return
        fetched = jax.device_get([m for _, m, _, _ in pending])
        # Steps run asynchronously: sample_time is the host's wait for the
        # input queue and update_time only the dispatch cost — the device
        # work lands at the blocking fetch above. step_time is the honest
        # figure: window wall clock (including that fetch) per step. The
        # reference's synchronous prints (train_representation.py:110)
        # correspond to step_time, not update_time.
        step_s = (time.time() - win_t0) / len(pending) if win_t0 else None
        for (step, _, sample_s, update_s), metrics in zip(pending, fetched):
            metrics = {k: float(v) for k, v in metrics.items()}
            metrics["sample_time"] = sample_s
            metrics["update_time"] = update_s
            if step_s is not None:
                metrics["step_time"] = step_s
            self.logger.log_metrics(metrics, step, ty="train")
            if step % 10 == 0:
                print(step, metrics)
                print(
                    f"Sample time {sample_s}, Update time {update_s}"
                    + (f", Step time {step_s:.4f}" if step_s is not None else "")
                )
                self.logger.dump(step, ty="train")

    def save_snapshot(self) -> str:
        """Snapshot the current state; returns the rolling snapshot path.

        With `async_snapshot` (the default) the returned path is the write
        DESTINATION — the file lands after the background write completes.
        Call `flush_snapshots()` (or let `train()`/`close()` do it) before
        reading the file back.
        """
        keep = int(self.cfg.get("keep_snapshots", 0))
        extra = {
            "lang_max_len": int(self.cfg.get("lang_max_len", 32)),
            # host data-stream positions for reproducible resume: batches
            # drawn from each dataset RNG *as consumed by the loop* (the
            # prefetch queues run ahead of this; their lookahead draws are
            # re-derived by replay on resume)
            "data_stream": {
                "train_batches": self._train_stream_pos0
                + (self.global_step - self._step0),
                "val_batches": self._val_batches,
                "local_batch_size": self._local_bs,
                "num_hosts": self._n_proc,
                "stream_fp": self._stream_fp,
            },
        }
        if self._snap_writer is None:
            path = save_train_snapshot(
                self.work_dir, self.state, self.model_cfg, extra_meta=extra
            )
            if keep > 0:
                self._prune_snapshots(keep)
            return path
        # Host-copy NOW: the next dispatched step donates these buffers.
        host_state = jax.device_get(self.state)

        def write():
            save_train_snapshot(
                self.work_dir, host_state, self.model_cfg, extra_meta=extra
            )
            if keep > 0:
                self._prune_snapshots(keep)

        self._snap_writer.submit(write)
        return os.path.join(self.work_dir, "snapshot.npz")

    def _prune_snapshots(self, keep: int):
        """Keep only the newest `keep` per-step snapshots (rolling one stays).

        The reference keeps every snapshot_{step}.pt (~1 GB each, 100 over a
        2M-step run) — retention is opt-in via cfg.keep_snapshots.
        """
        for _, p in step_snapshots(self.work_dir)[keep:]:
            try:
                os.remove(p)
            except OSError:
                pass

    def flush_snapshots(self):
        """Block until the in-flight snapshot write (if any) is durable."""
        if self._snap_writer is not None:
            self._snap_writer.wait()

    def close(self):
        # cleanup must not raise: close() runs in finally blocks (e.g. the
        # --retries requeue loop) where an exception would mask the original
        # error and skip pipeline shutdown
        try:
            self.flush_snapshots()
        except Exception as e:
            print(f"[workspace] async snapshot write failed: {e!r}")
        self.train_pipe.close()
        self.val_pipe.close()
