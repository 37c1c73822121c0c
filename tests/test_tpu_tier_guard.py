"""The on-chip tier's vacuous-pass guard (tests/test_tpu_kernels.py).

bench_battery.sh stage 0 gates every perf stage on `R3M_TPU_TESTS=1
pytest -m tpu` exiting 0. JAX silently falls back to CPU when libtpu
init fails, and pytest exits 0 on an all-skipped run — so if the tier
merely SKIPPED off-TPU, a mid-battery tunnel drop would turn the gate
green without lowering a single kernel through Mosaic. The tier's
autouse fixture must therefore FAIL when the tier was requested but the
backend is not TPU. That exact combination cannot be reproduced
end-to-end on this host (with R3M_TPU_TESTS=1 the axon plugin wins over
JAX_PLATFORMS and the run lands on the real chip), so this pins the
fixture's decision table directly.
"""

import pytest

import tests.test_tpu_kernels as tier


def _run_fixture():
    # __wrapped__ = the undecorated generator function behind the fixture
    gen = tier._no_vacuous_pass.__wrapped__()
    next(gen)  # raises Failed on the guard path, yields on the happy path


def test_requested_but_cpu_fails_not_skips(monkeypatch):
    monkeypatch.setattr(tier, "_REQUESTED", True)
    monkeypatch.setattr(tier, "_ON_TPU", False)
    with pytest.raises(pytest.fail.Exception, match="vacuous"):
        _run_fixture()


@pytest.mark.parametrize(
    "requested,on_tpu",
    [(True, True), (False, False), (False, True)],
    ids=["requested-on-tpu", "default-suite", "tpu-host-unrequested"],
)
def test_other_combinations_pass_through(monkeypatch, requested, on_tpu):
    monkeypatch.setattr(tier, "_REQUESTED", requested)
    monkeypatch.setattr(tier, "_ON_TPU", on_tpu)
    _run_fixture()  # must not raise
