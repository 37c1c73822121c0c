#!/usr/bin/env python
"""R3M-TPU pretraining entry point.

Usage (same override style as the reference's Hydra CLI,
/root/reference/README.md:32):

    python train_representation.py datapath=/path/to/ego4d \
        agent.langweight=1.0 agent.size=50 doaug=rctraj batch_size=16

Config root: cfgs/config_rep.yaml; `key.path=value` overrides are YAML-typed.
"""

import os
import sys


def _honor_jax_platforms_env():
    """Re-apply JAX_PLATFORMS after the fact (sitecustomize consumes it).

    Delegates to the shared helper every r3m_tpu CLI uses; kept as a local
    name because main() calls it before any other r3m_tpu import.
    """
    from r3m_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()


def _maybe_init_distributed(cfg):
    """Join a multi-process cluster BEFORE any backend use.

    The reference's parallelism is single-process DataParallel
    (``/root/reference/r3m/train_representation.py:30``); pod-scale runs
    here are multi-process SPMD, which requires `jax.distributed.initialize`
    ahead of the first device query. `distributed_init: auto` (default)
    initializes only when a launcher provides coordination env
    (JAX_COORDINATOR_ADDRESS, or a Cloud-TPU/Slurm/MPI environment JAX
    auto-detects); `true` forces it; `false` never.
    """
    mode = str(cfg.get("distributed_init", "auto")).lower()
    if mode in ("false", "0", "none", "no"):
        return
    env = os.environ
    explicit = env.get("JAX_COORDINATOR_ADDRESS")
    # a single-worker TPU_WORKER_HOSTNAMES (e.g. "localhost" on a one-host
    # slice or tunnel) is NOT a pod launch — require >1 worker for auto
    tpu_workers = [
        h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()
    ]
    if mode == "auto" and not (
        explicit or len(tpu_workers) > 1 or env.get("SLURM_JOB_ID")
        or env.get("OMPI_COMM_WORLD_SIZE")
    ):
        return
    import jax

    if explicit and (env.get("JAX_NUM_PROCESSES") or env.get("JAX_PROCESS_ID")):
        # explicit trio for bespoke launchers (and the integration test);
        # cloud/Slurm/MPI environments auto-detect all three below
        missing = [
            k
            for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
            if not env.get(k)
        ]
        if missing:
            raise ValueError(
                "JAX_COORDINATOR_ADDRESS is set but the launcher did not "
                f"export {' and '.join(missing)}; a bespoke pod launch needs "
                "all three of JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, "
                "JAX_PROCESS_ID"
            )
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=int(env["JAX_NUM_PROCESSES"]),
            process_id=int(env["JAX_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    print(
        f"[distributed] process {jax.process_index()}/{jax.process_count()} "
        f"({len(jax.local_devices())} local / {len(jax.devices())} global devices)"
    )


def _install_sigterm(ws):
    """Graceful preemption: SIGTERM finishes the current step, writes a
    final snapshot, and exits 0 — auto-resume continues on requeue. The
    reference relies on submitit requeue alone and loses everything since
    the last eval_freq snapshot."""
    import signal

    def handler(signum, frame):
        print("[signal] SIGTERM — stopping after current step")
        ws.request_stop()

    signal.signal(signal.SIGTERM, handler)


def main(argv=None):
    _honor_jax_platforms_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    from r3m_tpu.training.workspace import Workspace
    from r3m_tpu.utils.config import load_config

    cfg_path = os.path.join(os.path.dirname(__file__), "cfgs", "config_rep.yaml")
    retries = 0
    for a in list(argv):
        if a.startswith("--config="):
            cfg_path = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--retries="):
            # in-process requeue (the reference's submitit-launcher role,
            # r3m/cfgs/hydra/launcher/local.yaml): on a crash, rebuild the
            # workspace — auto-resume continues from the last snapshot
            retries = int(a.split("=", 1)[1])
            argv.remove(a)
    cfg = load_config(cfg_path, overrides=argv)
    _maybe_init_distributed(cfg)

    attempt = 0
    while True:
        ws = None
        try:
            # construction inside the try: a crash while REBUILDING the
            # workspace (TPU runtime re-initializing, transient storage
            # error) is exactly what the requeue exists for
            ws = Workspace(cfg)
            _install_sigterm(ws)
            ws.train()
            return
        except KeyboardInterrupt:
            raise
        except Exception as e:
            attempt += 1
            if attempt > retries:
                raise
            print(f"[requeue] attempt {attempt}/{retries} after "
                  f"{type(e).__name__}: {e}")
        finally:
            if ws is not None:
                ws.close()


if __name__ == "__main__":
    main()
