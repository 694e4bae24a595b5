"""Serving examples: dynamic batching and continuous batching.

    python examples/serve.py tiny.npz [n_requests]

Feeds synthetic concurrent requests through both serving layers and prints
throughput. Swap in real audio + a real checkpoint for production use.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    npz_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from whisper_tpu import BatchedTranscriber, ContinuousBatcher, WhisperPipeline
    pipe = WhisperPipeline.from_npz(npz_path, "tiny")
    rng = np.random.RandomState(0)
    audios = [(rng.randn(16_000 * 10) * 0.1).astype(np.float32)
              for _ in range(n)]

    # --- dynamic batcher: whole requests grouped into fixed-shape batches
    with BatchedTranscriber(pipe.params, pipe.cfg, max_batch=8) as bt:
        t0 = time.perf_counter()
        futures = [bt.submit(a) for a in audios]
        results = [f.result() for f in futures]
        dt = time.perf_counter() - t0
    print(f"dynamic batcher: {n} x 10s in {dt:.2f}s "
          f"(RTFx {n * 10 / dt:.0f}); sample: {results[0].text[:60]!r}")

    # --- continuous batcher: requests join/leave at token granularity
    eng = ContinuousBatcher(pipe.params, pipe.cfg, max_slots=8)
    t0 = time.perf_counter()
    rids = [eng.submit(a) for a in audios]
    out = eng.run_until_idle()
    dt = time.perf_counter() - t0
    print(f"continuous batcher: {n} x 10s in {dt:.2f}s "
          f"(RTFx {n * 10 / dt:.0f}); sample: {eng.decode_text(rids[0])[:60]!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
