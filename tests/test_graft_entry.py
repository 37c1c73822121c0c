"""Driver deliverables stay healthy: entry() traces, dryrun_multichip runs."""

import jax
import pytest


@pytest.mark.slow
def test_entry_traces():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)  # full trace, no compute
    assert out.shape == (4, 2048)


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) == 8
    dryrun_multichip(8)  # asserts internally (step executed, finite loss)
