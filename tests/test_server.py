"""HTTP serving daemon (whisper_tpu/server.py) end-to-end over a real
socket: POST WAV bytes and JSON-b64 forms, health/stats, error paths."""

import io
import json
import base64
import urllib.error
import urllib.request
import wave

import numpy as np
import pytest


def _wav_bytes(seconds=1.0, freq=330.0, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * freq * t) * 32000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server(small_cfg):
    import jax
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.serving import BatchedTranscriber
    from whisper_tpu.server import TranscriptionServer

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    bt = BatchedTranscriber(params, small_cfg, max_batch=2, max_new=4)
    with TranscriptionServer(bt, small_cfg, host="127.0.0.1", port=0) as s:
        yield s


def _post(port, path, data, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"


def test_transcribe_wav_body(server, small_cfg):
    status, body = _post(server.port, "/v1/audio/transcriptions?language=en",
                         _wav_bytes(), "audio/wav")
    assert status == 200
    assert body["tokens"][:4] == [50258, 50259, 50359, 50363]
    assert isinstance(body["text"], str) and body["batch_size"] >= 1


def test_transcribe_json_b64(server):
    payload = json.dumps({
        "audio_b64": base64.b64encode(_wav_bytes(freq=440.0)).decode(),
        "language": "en", "task": "transcribe"}).encode()
    status, body = _post(server.port, "/v1/audio/transcriptions",
                         payload, "application/json")
    assert status == 200 and body["tokens"][0] == 50258


def test_bad_request_does_not_kill_engine(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/v1/audio/transcriptions",
              b"not a wav", "audio/wav")
    assert e.value.code == 400
    # engine still alive
    status, _ = _post(server.port, "/v1/audio/transcriptions",
                      _wav_bytes(), "audio/wav")
    assert status == 200


def test_stats_counts(server):
    # issue our own traffic so the assertions hold in isolation
    _post(server.port, "/v1/audio/transcriptions", _wav_bytes(), "audio/wav")
    with pytest.raises(urllib.error.HTTPError):
        _post(server.port, "/v1/audio/transcriptions", b"junk", "audio/wav")
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v1/stats", timeout=30) as r:
        body = json.loads(r.read())
    assert body["completed"] >= 1 and body["failed"] >= 1
    assert body["in_flight"] == 0


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/nope", b"", "text/plain")
    assert e.value.code == 404


@pytest.fixture(scope="module")
def continuous_server(small_cfg):
    """The continuous-engine variant: same HTTP surface, token-granular
    slot batching under the hood."""
    import jax
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.serving_continuous import ContinuousBatcher
    from whisper_tpu.server import ContinuousEngine, TranscriptionServer

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    eng = ContinuousEngine(ContinuousBatcher(params, small_cfg,
                                             max_slots=2, max_new=4))
    with TranscriptionServer(eng, small_cfg, host="127.0.0.1", port=0) as s:
        yield s


def test_continuous_engine_transcribes(continuous_server):
    status, body = _post(continuous_server.port,
                         "/v1/audio/transcriptions?language=en",
                         _wav_bytes(), "audio/wav")
    assert status == 200
    assert body["tokens"][:4] == [50258, 50259, 50359, 50363]
    assert body["batch_size"] >= 1


def test_continuous_engine_concurrent(continuous_server):
    """Two concurrent requests share the slot engine and both complete."""
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(_post, continuous_server.port,
                          "/v1/audio/transcriptions",
                          _wav_bytes(freq=300 + 100 * i), "audio/wav")
                for i in range(2)]
        for f in futs:
            status, body = f.result(timeout=180)
            assert status == 200 and body["tokens"][0] == 50258


def test_continuous_engine_bad_language_fails_cleanly(continuous_server):
    """Regression (review r2): a bad language param must fail THIS request
    with 4xx/5xx and leave the engine alive — it used to kill the pump
    thread and hang the server forever."""
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(continuous_server.port,
              "/v1/audio/transcriptions?language=zz",
              _wav_bytes(), "audio/wav")
    assert e.value.code in (400, 500)
    status, body = _post(continuous_server.port,
                         "/v1/audio/transcriptions?language=en",
                         _wav_bytes(), "audio/wav")
    assert status == 200 and body["tokens"][0] == 50258


def test_streaming_sse_endpoint(small_cfg):
    """POST ?stream=1 against the continuous engine: SSE events arrive one
    per token, then a final done event with the full result."""
    import jax
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.server import ContinuousEngine, TranscriptionServer
    from whisper_tpu.serving_continuous import ContinuousBatcher

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    eng = ContinuousEngine(ContinuousBatcher(params, small_cfg,
                                             max_slots=2, max_new=5))
    with TranscriptionServer(eng, small_cfg, host="127.0.0.1", port=0) as s:
        req = urllib.request.Request(
            f"http://127.0.0.1:{s.port}/v1/audio/transcriptions?stream=1",
            data=_wav_bytes(), headers={"Content-Type": "audio/wav"},
            method="POST")
        events = []
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[6:]))
    assert events, "no SSE events received"
    final = events[-1]
    assert final.get("done") is True
    toks = [e["token"] for e in events[:-1]]
    assert final["tokens"][:4] == [50258, 50259, 50359, 50363]
    # streamed tokens are exactly the generated region of the final result
    assert final["tokens"][-len(toks):] == toks
    assert isinstance(final["text"], str)


def test_streaming_rejected_on_dynamic_engine(server):
    status = None
    try:
        _post(server.port, "/v1/audio/transcriptions?stream=1",
              _wav_bytes(), "audio/wav")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 501


def test_continuous_engine_longform_audio(continuous_server, small_cfg):
    """Audio longer than one 30 s window routes through the long-form
    driver (window-chained with prev conditioning) instead of being
    silently truncated: the response carries BOTH windows' tokens."""
    status, body = _post(continuous_server.port,
                         "/v1/audio/transcriptions?language=en",
                         _wav_bytes(seconds=31.0), "audio/wav")
    assert status == 200
    # long-form results are generated tokens across >=2 windows; the
    # engine caps each window at max_new=4 so >4 tokens proves window 2 ran
    assert len(body["tokens"]) > 4


def test_admission_503_and_queue_stats(small_cfg):
    """Server-level admission story (VERDICT r3 #3): when the continuous
    engine's wait queue is at max_queue, a new request gets HTTP 503 +
    Retry-After instead of unbounded queueing, and /v1/stats exposes the
    queue telemetry (depth/served/max-wait)."""
    import jax
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.serving_continuous import ContinuousBatcher
    from whisper_tpu.server import ContinuousEngine, TranscriptionServer

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    # max_queue=0: every un-admitted submit bounces — deterministic 503
    eng = ContinuousEngine(ContinuousBatcher(params, small_cfg,
                                             max_slots=1, max_new=3,
                                             max_queue=0))
    with TranscriptionServer(eng, small_cfg, host="127.0.0.1",
                             port=0) as s:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(s.port, "/v1/audio/transcriptions", _wav_bytes(),
                  "audio/wav")
        assert e.value.code == 503
        assert e.value.headers.get("Retry-After") is not None

        req = urllib.request.Request(f"http://127.0.0.1:{s.port}/v1/stats")
        with urllib.request.urlopen(req, timeout=30) as r:
            stats = json.loads(r.read())
        assert "queue" in stats
        for key in ("depth", "served", "max_wait_s", "p50_wait_s"):
            assert key in stats["queue"]
