"""ctypes bindings for the native runtime library (native/whisper_native.cpp).

Build model: g++ compiles native/whisper_native.cpp into
native/libwhisper_native.so on first use (cached; rebuilt when the source is
newer). Every entry point has a pure-Python fallback, so the framework works
without a toolchain — `available()` reports which path is active.

The compute path (encoder/decoder/kernels) is JAX/XLA/Pallas and never goes
through this library; this is the host runtime: audio decode + resample
(serving data loader), zero-copy mmap'ed weight access (vs the reference's
read-everything loader.mojo:5-31), and batch detokenization
(vs tokenizer.mojo:4-28).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "whisper_native.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libwhisper_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        needs_build = (not os.path.exists(_LIB)
                       or os.path.getmtime(_LIB) < os.path.getmtime(_SRC))
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        # signatures
        lib.wn_free.argtypes = [ctypes.c_void_p]
        lib.wn_decode_wav.restype = ctypes.c_long
        lib.wn_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int)]
        lib.wn_resample.restype = ctypes.c_long
        lib.wn_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.wn_mmap_open.restype = ctypes.c_void_p
        lib.wn_mmap_open.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_long)]
        lib.wn_mmap_close.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.wn_detok_new.restype = ctypes.c_void_p
        lib.wn_detok_new.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.wn_detok_vocab_size.restype = ctypes.c_long
        lib.wn_detok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.wn_detok_decode.restype = ctypes.c_long
        lib.wn_detok_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.wn_detok_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is built and loaded."""
    return _load() is not None


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono float32 array, sample_rate). Native when available,
    else the Python `wave`-module fallback in pipeline.load_wav semantics."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    rate = ctypes.c_int()
    n = lib.wn_decode_wav(data, len(data), ctypes.byref(out),
                          ctypes.byref(rate))
    if n < 0:
        raise ValueError(f"wn_decode_wav error {n}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wn_free(out)
    return arr, rate.value


def resample(x: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    """Windowed-sinc resample (native)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.wn_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        len(x), in_rate, out_rate, ctypes.byref(out))
    if n < 0:
        raise MemoryError("wn_resample failed")
    try:
        y = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wn_free(out)
    return y


def load_audio(path: str, target_rate: int = 16_000) -> np.ndarray:
    """WAV file -> mono float32 at target_rate. Prefers the native decoder +
    resampler; falls back to the pure-Python path."""
    if available():
        with open(path, "rb") as f:
            data = f.read()
        try:
            x, rate = decode_wav(data)
            if rate != target_rate:
                x = resample(x, rate, target_rate)
            return x
        except ValueError:
            pass  # e.g. unusual codec — fall through to Python path
    from whisper_tpu.pipeline import load_wav
    return load_wav(path, target_rate)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

class MappedWeights:
    """mmap'ed view of a flat-bin weight file: zero-copy numpy fp32 view.

    Falls back to np.memmap when the native library is missing (same
    zero-copy property; the native path exists so non-Python hosts can share
    the implementation)."""

    def __init__(self, path: str):
        self._lib = _load()
        self._addr = None
        if self._lib is not None:
            size = ctypes.c_long()
            addr = self._lib.wn_mmap_open(path.encode(), ctypes.byref(size))
            if addr:
                self._addr = addr
                self._size = size.value
                buf = (ctypes.c_byte * self._size).from_address(addr)
                self.floats = np.frombuffer(buf, dtype="<f4")
                return
        self.floats = np.memmap(path, dtype="<f4", mode="r")

    def close(self):
        if self._addr is not None:
            self._lib.wn_mmap_close(self._addr, self._size)
            self._addr = None
            self.floats = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# detokenizer
# ---------------------------------------------------------------------------

class NativeDetokenizer:
    """Batch detokenizer over the vocab.txt contract; both GPT-2 byte-level
    and the reference's lossy mode (tokenizer.mojo:15-28)."""

    def __init__(self, vocab_path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        with open(vocab_path, "rb") as f:
            data = f.read()
        self._h = lib.wn_detok_new(data, len(data))
        if not self._h:
            raise RuntimeError("wn_detok_new failed")

    @property
    def vocab_size(self) -> int:
        return self._lib.wn_detok_vocab_size(self._h)

    def decode(self, ids, skip_special: bool = True,
               reference_mode: bool = False) -> str:
        arr = np.ascontiguousarray(ids, dtype=np.int32)
        cap = max(64, 8 * len(arr))
        for _ in range(2):
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.wn_detok_decode(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr), buf, cap, int(skip_special), int(reference_mode))
            if n >= 0:
                return buf.raw[:n].decode("utf-8", errors="replace")
            cap = -n
        raise RuntimeError("detok buffer sizing failed")

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.wn_detok_free(self._h)
        except Exception:
            pass
