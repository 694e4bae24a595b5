"""utils.profiling: phase timers, report shape, rtfx math."""

import time

import jax.numpy as jnp

from whisper_tpu.utils import PhaseTimer, TimingReport, rtfx


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b", sync=jnp.zeros((4,))):
        time.sleep(0.005)
    rep = t.report
    assert rep.phases["a"] >= 0.02
    assert rep.phases["b"] >= 0.005
    assert rep.total_s == sum(rep.phases.values())
    assert "a=" in str(rep) and "total=" in str(rep)


def test_timed_returns_result():
    t = PhaseTimer()
    out = t.timed("mul", lambda x: x * 2, jnp.ones((8,)))
    assert float(out.sum()) == 16.0
    assert t.report.phases["mul"] > 0


def test_rtfx():
    assert rtfx(30.0, 0.75) == 40.0
    assert rtfx(30.0, 0.0) > 1e6          # no div-by-zero


def test_report_as_dict():
    r = TimingReport(phases={"x": 1.0, "y": 2.0})
    d = r.as_dict()
    assert d["total_s"] == 3.0 and d["x"] == 1.0
