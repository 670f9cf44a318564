"""Minimal WAV (PCM-16 mono) codec — pure stdlib (wave/struct) + numpy.

Like minipng for images: the container has no ffmpeg/librosa, but RIFF/WAV
PCM is a public format the stdlib ``wave`` module reads and writes — so the
audio path decodes REAL samples instead of stubbing.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_pcm16(samples: np.ndarray, *, sample_rate: int = 8000) -> bytes:
    """int16 mono sample array → WAV bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_pcm16 expects a 1-D int16 array")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample_rate). Mono PCM-16 only."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("miniwav reads mono PCM-16 only")
        data = w.readframes(w.getnframes())
        return np.frombuffer(data, dtype=np.int16), w.getframerate()
