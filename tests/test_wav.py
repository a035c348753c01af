"""WAV/PCM codec + real AudioChunk feature path."""

import numpy as np
import pyarrow as pa
import pytest

from xhs_ocr_ray.stages.multimodal import MEDIA_SCHEMA, AudioChunk
from xhs_ocr_ray.wav import decode_wav, encode_wav, is_wav


def test_wav_roundtrip_16bit():
    rng = np.random.default_rng(5)
    s = rng.integers(-30000, 30000, size=1234, dtype=np.int16)
    payload = encode_wav(s, 8000)
    assert is_wav(payload)
    got, rate = decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(got, s.astype(np.int32))


def test_wav_decode_8_24_32bit_and_stereo():
    import io
    import wave

    def make(width, nch, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(16000)
            w.writeframes(frames)
        return buf.getvalue()

    # 8-bit unsigned, offset-binary: 128 → 0, 255 → 127, 0 → -128
    got, rate = decode_wav(make(1, 1, bytes([128, 255, 0])))
    assert rate == 16000 and got.tolist() == [0, 127, -128]
    # 24-bit little-endian incl. sign extension
    raw = (b"\x01\x00\x00"        # 1
           b"\xff\xff\xff"        # -1
           b"\x00\x00\x80")       # -2^23
    got, _ = decode_wav(make(3, 1, raw))
    assert got.tolist() == [1, -1, -(1 << 23)]
    # 32-bit
    s32 = np.array([7, -(1 << 30)], dtype="<i4")
    got, _ = decode_wav(make(4, 1, s32.tobytes()))
    assert got.tolist() == [7, -(1 << 30)]
    # stereo folds to mono by floor-div average: (100 + 301)//2 = 200
    st = np.array([100, 301, -5, -6], dtype="<i2")  # L,R,L,R
    got, _ = decode_wav(make(2, 2, st.tobytes()))
    assert got.tolist() == [200, -6]


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVEgarbage")


def _media_row(mid, payload, dur=0):
    return pa.table(
        {
            "media_id": pa.array([mid], pa.int64()),
            "media_type": pa.array(["audio"], pa.string()),
            "payload": pa.array([payload], pa.binary()),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "duration_ms": pa.array([dur], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def test_audio_chunk_real_wav_features():
    """Square wave ±A flipping every hp samples: rms = A exactly, peak = A,
    crossings per window = (end-1)//hp - start//hp; last window truncated."""
    amp, hp, rate, n = 1000, 4, 8000, 10_000
    i = np.arange(n)
    x = np.where((i // hp) % 2 == 0, amp, -amp).astype(np.int16)
    out = AudioChunk(chunk_ms=500)(_media_row(7, encode_wav(x, rate))).to_pandas()
    cs = rate * 500 // 1000  # 4000 samples per window
    assert out["chunk_start_ms"].tolist() == [0, 500, 1000]
    assert out["n_samples"].tolist() == [4000, 4000, 2000]
    assert out["rms"].tolist() == [float(amp)] * 3
    assert out["peak"].tolist() == [amp] * 3
    want_zc = [(min((c + 1) * cs, n) - 1) // hp - (c * cs) // hp
               for c in range(3)]
    assert out["zero_crossings"].tolist() == want_zc
    assert (out["status"] == "ok").all()
    assert out["feature"].map(len).tolist() == [3, 3, 3]


def test_audio_chunk_corrupt_wav_quarantined_row_locally():
    good = encode_wav(np.array([5, -5] * 100, dtype=np.int16), 8000)
    corrupt = good[:20]  # RIFF/WAVE magic intact, truncated body
    batch = pa.concat_tables([_media_row(1, good), _media_row(2, corrupt)])
    out = AudioChunk(chunk_ms=1000)(batch).to_pandas()
    by_id = out.groupby("media_id")["status"].first()
    assert by_id[1] == "ok"
    assert by_id[2] == "failed_decode"
    bad = out[out.media_id == 2]
    assert bad["rms"].isna().all() and bad["feature"].isna().all()


def test_audio_chunk_empty_wav_single_zero_window():
    out = AudioChunk(chunk_ms=1000)(
        _media_row(3, encode_wav(np.array([], dtype=np.int16), 8000))
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["n_samples"] == 0 and out.iloc[0]["rms"] == 0.0


def test_audio_chunk_non_wav_still_raises_without_fake():
    with pytest.raises(NotImplementedError):
        AudioChunk()(_media_row(4, b"ID3\x04mp3-like", dur=2000))
