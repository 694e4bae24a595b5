"""Tracing and timing (replaces the reference's ad-hoc perf_counter prints,
main.mojo:29-33, with structured per-phase reports and real profiler traces).

  * PhaseTimer — context-managed wall-clock phases with `block_until_ready`
    sync, so timings measure device work rather than dispatch.
  * trace() — jax.profiler trace capture (XProf/Perfetto viewable).
  * rtfx() — audio-seconds per wall-second, the framework's north-star
    metric (reference-implied baseline: 30/0.74 ~= 40.5, readme.md:82).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Iterator

import jax


@dataclasses.dataclass
class TimingReport:
    phases: dict[str, float] = dataclasses.field(default_factory=dict)

    @property
    def total_s(self) -> float:
        return sum(self.phases.values())

    def as_dict(self) -> dict[str, float]:
        d = dict(self.phases)
        d["total_s"] = self.total_s
        return d

    def __str__(self) -> str:
        parts = [f"{k}={v * 1e3:.1f}ms" for k, v in self.phases.items()]
        return " ".join(parts) + f" total={self.total_s * 1e3:.1f}ms"


class PhaseTimer:
    """Accumulating per-phase timer.

    with timer.phase("encode", result_fn=lambda: enc_out):
        enc_out = encoder_forward(...)

    The phase's end time is taken after `jax.block_until_ready` on the
    phase's result (passed via sync=) so async dispatch doesn't make phases
    look free.
    """

    def __init__(self):
        self.report = TimingReport()

    @contextlib.contextmanager
    def phase(self, name: str, sync: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.report.phases[name] = (
                self.report.phases.get(name, 0.0) + time.perf_counter() - t0)

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its result, record the phase, return the result."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.report.phases[name] = (
            self.report.phases.get(name, 0.0) + time.perf_counter() - t0)
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/whisper_tpu_trace") -> Iterator[str]:
    """Capture a jax.profiler trace for the enclosed region. View with
    XProf/TensorBoard or convert to Perfetto. Yields the log dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def rtfx(audio_seconds: float, wall_seconds: float) -> float:
    """Real-time factor: audio seconds transcribed per wall-clock second."""
    return audio_seconds / max(wall_seconds, 1e-12)
