"""Pure-stdlib WAV/PCM codec (reference analog: the pixel/media ingestion
surface, core/run.py:660-676 — here for the audio column).

``decode_wav`` parses RIFF/WAVE PCM via the stdlib ``wave`` module and
returns integer samples untouched (8/16/24/32-bit), so downstream features
(RMS / zero crossings / peak) are exact integer arithmetic with a bit-exact
SQL oracle. ``encode_wav`` writes 16-bit PCM mono — the fixture writer.

Compressed codecs (MP3/AAC/Opus) have no decoder in this container and stay
behind the loud ``fake=True`` stub in :class:`stages.multimodal.AudioChunk`.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC_RIFF = b"RIFF"


def is_wav(payload: bytes) -> bool:
    return payload[:4] == WAV_MAGIC_RIFF and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ``(samples, sample_rate)``.

    ``samples`` is int32, shape ``(n,)``: multi-channel audio is folded to
    mono by averaging with integer floor division (deterministic, no
    floats). Raises ``ValueError`` on anything that is not parseable PCM —
    callers quarantine row-locally like the image path.
    """
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            nframes = w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e
    if width == 1:  # unsigned 8-bit, offset binary
        flat = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        flat = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 3:  # 24-bit little-endian: widen via byte assembly
        b = np.frombuffer(raw, dtype=np.uint8)
        if len(b) % 3:
            raise ValueError("corrupt WAV: 24-bit stream not a 3-byte multiple")
        b = b.reshape(-1, 3).astype(np.int32)
        flat = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        flat = np.where(flat & 0x800000, flat - (1 << 24), flat)
    elif width == 4:
        flat = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        usable = (len(flat) // nch) * nch
        # numpy upcasts the channel sum to int64; the mean of int32 samples
        # fits int32 by construction — cast back to honor the documented
        # "samples are int32" contract (ADVICE r04).
        flat = (flat[:usable].reshape(-1, nch).sum(axis=1) // nch).astype(
            np.int32)
    return flat, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono int16 samples → RIFF/WAVE 16-bit PCM bytes (fixture writer)."""
    s = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()
