"""Config helpers: meta reconstruction, hydra-style instantiate, coercion."""

import numpy as np
import pytest

from r3m_tpu.checkpoint import r3m_config_from_meta
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.utils.config import agent_to_r3m_config, instantiate, load_config


def test_config_from_meta_filters_and_overrides():
    meta = {"config": {"size": 50, "langweight": 1.0, "junk_key": 3}}
    cfg = r3m_config_from_meta(meta, langweight=0, compute_dtype="float32")
    assert cfg.size == 50 and cfg.langweight == 0
    assert cfg.compute_dtype == "float32"
    assert r3m_config_from_meta({}).size == R3MConfig().size  # defaults


def test_agent_to_r3m_config_string_coercion():
    # pyyaml parses exponent-only literals like 1e-5 as STRINGS
    cfg = agent_to_r3m_config(
        {"size": 18, "l1weight": "1e-5", "lr": "1e-4", "device": "cuda",
         "_target_": "r3m.R3M"}
    )
    assert cfg.l1weight == 1e-5 and cfg.lr == 1e-4 and cfg.size == 18


def test_root_yaml_accepts_documented_remat_override():
    """README documents `agent.remat=conv_saved`; the strict override
    machinery only accepts keys present in the root yaml, so the knob must
    live there and flow through to R3MConfig."""
    cfg = load_config("cfgs/config_rep.yaml", ["agent.remat=conv_saved"])
    assert agent_to_r3m_config(cfg["agent"]).remat == "conv_saved"
    assert agent_to_r3m_config(load_config("cfgs/config_rep.yaml")["agent"]).remat == "none"


def test_root_yaml_accepts_packed_bn_override():
    """Same contract for the packed-BN layout escape hatch (default on)."""
    cfg = load_config("cfgs/config_rep.yaml", ["agent.packed_bn=false"])
    assert agent_to_r3m_config(cfg["agent"]).packed_bn is False
    assert (
        agent_to_r3m_config(load_config("cfgs/config_rep.yaml")["agent"])
        .packed_bn is True
    )


def test_root_yaml_accepts_vit_fused_attn_override():
    """Same contract for the ViT fused-attention lever (size=0 only)."""
    cfg = load_config(
        "cfgs/config_rep.yaml",
        ["agent.vit_fused_attn=true", "agent.size=0", "agent.tcnweight=0.0"],
    )
    r3m_cfg = agent_to_r3m_config(cfg["agent"])
    assert r3m_cfg.vit_fused_attn is True and r3m_cfg.size == 0
    # the YAML default is "auto": batched kernel when training, einsum
    # when serving (ViT); always the einsum path on ResNet backbones
    default = agent_to_r3m_config(load_config("cfgs/config_rep.yaml")["agent"])
    assert default.vit_fused_attn == "auto"
    assert default.resolved_fused_attn(train=True) is False  # ResNet
    vit = agent_to_r3m_config(
        load_config("cfgs/config_rep.yaml", ["agent.size=0"])["agent"]
    )
    assert vit.resolved_fused_attn(train=True) == "batched"
    assert vit.resolved_fused_attn(train=False) is False


def test_distributed_auto_gate(monkeypatch):
    """`distributed_init: auto` must NOT call jax.distributed.initialize on
    a single-worker host: the axon tunnel exports TPU_WORKER_HOSTNAMES=
    "localhost" (one worker), which is not a pod launch. Explicit
    coordination env or >1 TPU worker triggers it; `false` never does."""
    import jax

    import train_representation as tr

    for k in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE"):
        monkeypatch.delenv(k, raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize", lambda *a, **kw: calls.append(kw))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    tr._maybe_init_distributed({"distributed_init": "auto"})
    assert calls == []

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    tr._maybe_init_distributed({"distributed_init": "false"})
    assert calls == []
    tr._maybe_init_distributed({"distributed_init": "auto"})
    assert len(calls) == 1

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    tr._maybe_init_distributed({"distributed_init": "auto"})
    assert len(calls) == 2 and calls[-1]["process_id"] == 1

    # incomplete explicit trio: an actionable error naming the missing var,
    # not a bare KeyError from the launcher's forgotten export
    monkeypatch.delenv("JAX_PROCESS_ID")
    with pytest.raises(ValueError, match="JAX_PROCESS_ID"):
        tr._maybe_init_distributed({"distributed_init": "auto"})
    assert len(calls) == 2


def test_instantiate_target():
    obj = instantiate({"_target_": "collections.OrderedDict"}, a=1)
    assert obj["a"] == 1


def test_nested_attribute_write_persists():
    """cfg.agent.langweight = x must mutate cfg, not a throwaway copy."""
    from r3m_tpu.utils.config import Config

    cfg = Config({"agent": {"langweight": 0.0, "inner": {"d": 1}}})
    cfg.agent.langweight = 1.0
    assert cfg["agent"]["langweight"] == 1.0
    cfg.agent.inner.d = 7
    assert cfg["agent"]["inner"]["d"] == 7


def test_embedded_and_null_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "root: /data\n"
        "datapath: ${root}/ego4d\n"
        "n_devices: ~\n"
        "mirror: ${n_devices}\n"
    )
    cfg = load_config(str(p))
    assert cfg["datapath"] == "/data/ego4d"  # embedded text substitution
    assert cfg["mirror"] is None  # null-valued key resolves like OmegaConf
    with pytest.raises(KeyError, match="unresolvable"):
        load_config(str(p), overrides=["+x=${missing_key}"])


def test_interpolation_cycle_is_diagnosed(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: ${b}\nb: ${a}\n")
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(p))


def test_base_dict_configs_are_strict_too():
    with pytest.raises(KeyError, match="unknown config key"):
        load_config(None, overrides=["batch_sise=4"], base={"batch_size": 32})
    cfg = load_config(None, overrides=["+new=1"], base={"batch_size": 32})
    assert cfg["new"] == 1


def test_invalid_doaug_rejected():
    from r3m_tpu.models.r3m import R3MConfig
    from r3m_tpu.training.trainer import make_train_step

    with pytest.raises(ValueError, match="doaug"):
        make_train_step(R3MConfig(size=18, langweight=0.0), doaug="rctrja")


def test_now_resolver_expands_run_dir(tmp_path):
    """The reference's Hydra output config date-templates run dirs with
    ${now:FMT} (r3m/cfgs/hydra/output/local.yaml:3-8); load_config must
    expand the same syntax, with every occurrence naming one instant."""
    import re
    import time

    p = tmp_path / "c.yaml"
    p.write_text(
        "log_dir: ./r3moutput/${now:%Y-%m-%d}_${now:%H-%M-%S}\n"
        "snap_dir: ${log_dir}/snaps\n"
    )
    before = time.localtime()
    cfg = load_config(str(p))
    assert "${" not in cfg["log_dir"]
    m = re.fullmatch(
        r"\./r3moutput/(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})", cfg["log_dir"]
    )
    assert m, cfg["log_dir"]
    assert m.group(1) >= time.strftime("%Y-%m-%d", before)
    # chained interpolation sees the expanded value
    assert cfg["snap_dir"] == cfg["log_dir"] + "/snaps"
