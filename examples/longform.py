"""Concurrent long-form transcription over the continuous engine.

    python examples/longform.py tiny.npz [n_files] [minutes_each]

N long files are transcribed AT ONCE: each file's 30 s windows chain
through the shared slot engine (window k+1 submitted the moment window k
is harvested, carrying previous-text conditioning), so the lockstep
batch stays full instead of serializing per file the way a per-file
pipeline.transcribe loop would.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    npz_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    minutes = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    from whisper_tpu import ContinuousBatcher, WhisperPipeline
    from whisper_tpu.serving_longform import LongFormDriver

    pipe = WhisperPipeline.from_npz(npz_path, "tiny")
    rng = np.random.RandomState(0)
    secs = int(minutes * 60)
    files = [(rng.randn(16_000 * secs) * 0.1).astype(np.float32)
             for _ in range(n)]

    eng = ContinuousBatcher(pipe.params, pipe.cfg, max_slots=min(8, n),
                            sync_every=8)
    drv = LongFormDriver(eng, condition_on_previous=True)
    t0 = time.perf_counter()
    fids = [drv.submit(a) for a in files]
    out = drv.run()
    dt = time.perf_counter() - t0

    total_audio = n * secs
    for fid in fids:
        r = out[fid]
        print(f"file {fid}: {r.windows} windows, "
              f"{len(r.tokens)} tokens, text[:60]={r.text[:60]!r}")
    print(f"{n} x {minutes:.1f} min concurrently in {dt:.1f}s "
          f"(RTFx {total_audio / dt:.0f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
