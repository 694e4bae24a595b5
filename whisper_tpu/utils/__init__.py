"""Runtime utilities: tracing/profiling, structured timing, RTFx metrics.

The reference's entire observability story is one perf_counter around
transcribe() plus prints (reference main.mojo:29-33); this package provides
the production equivalents: per-phase timers with device sync, XProf/Perfetto
trace capture via jax.profiler, and RTFx computation.
"""

from whisper_tpu.utils.profiling import (
    PhaseTimer,
    TimingReport,
    rtfx,
    trace,
)
