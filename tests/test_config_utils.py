"""Config helpers: meta reconstruction, hydra-style instantiate, coercion."""

import numpy as np

from r3m_tpu.checkpoint import r3m_config_from_meta
from r3m_tpu.models.r3m import R3MConfig
from r3m_tpu.utils.config import agent_to_r3m_config, instantiate


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
