"""Multimodal (image/audio/video) column stages.

Binary payloads travel as opaque ``binary`` columns with typed metadata
columns (``media_type``, ``width``/``height``/``duration_ms``). Every stage
is an actor-pool ``map_batches`` class (decoder state warmed in
``__init__``), small batch sizes because rows are wide.

Image decode is REAL for PNG, GIF, BMP and baseline JPEG payloads
(pure-Python codecs — the PIL/cv2 analog of the reference's pixel
ingestion at core/run.py:660-676); audio decode is REAL for WAV/PCM
(:mod:`xhs_ocr_ray.wav`). Remaining formats (WebP/AVIF, MP3/AAC, video
codecs) have no decode path in this container: those raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic fake decode so schemas, batch sizing and output layout stay
testable end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xhs_ocr_ray.functions.hashing import stable_hash64
from xhs_ocr_ray.png import decode_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: seeded by payload hash (stands in for a
    real image decoder, which is unavailable here)."""
    rng = np.random.default_rng(stable_hash64(payload) & 0xFFFFFFFF)
    return rng.integers(0, 256, size=(max(h, 1), max(w, 1), 3), dtype=np.uint8)


class ImageDecode:
    """Actor stage: binary image payload → feature vector + decoded dims +
    exact mean pixel value.

    PNG payloads decode for REAL (:func:`xhs_ocr_ray.png.decode_png`);
    other formats raise ``NotImplementedError`` unless ``fake=True``
    substitutes the deterministic stand-in (so downstream stages are
    exercised even for formats this container cannot decode).

    Corrupt payloads (a codec ``ValueError``) are quarantined ROW-LOCALLY,
    mirroring the PDF path's ``status='failed_parse'`` contract
    (engine.py): the row is kept with ``status='failed_decode'``, null
    feature/mean and zero dims, instead of failing the whole Ray task.
    ``NotImplementedError`` (unsupported format, not corrupt data) still
    raises — that is a configuration error, not a data error.
    """

    def __init__(self, fake: bool = False, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if payload[:8] == _PNG_SIG:
            return decode_png(payload)  # real pixels, real dims
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from xhs_ocr_ray.gif import decode_gif

            return decode_gif(payload)  # real pixels (pure-Python LZW)
        if payload[:2] == b"BM":
            from xhs_ocr_ray.bmp import decode_bmp

            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            from xhs_ocr_ray.jpeg import decode_jpeg

            return decode_jpeg(payload)  # real pixels (baseline DCT)
        if not self.fake:
            raise NotImplementedError(
                "image decode beyond PNG/GIF/BMP/JPEG requires PIL/cv2, not "
                "present in this container; those four decode natively — "
                "construct ImageDecode(fake=True) for a deterministic stub "
                "otherwise (e.g. WebP/AVIF payloads)"
            )
        return _fake_pixels(payload, w, h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        feats: list[list[float] | None] = []
        dec_w: list[int] = []
        dec_h: list[int] = []
        means: list[float | None] = []
        statuses: list[str] = []
        for p, w, h in zip(payloads, ws, hs):
            try:
                px = self._decode(p or b"", w or 0, h or 0)
            except ValueError:
                # corrupt payload — quarantine row-locally (see class doc)
                feats.append(None)
                dec_w.append(0)
                dec_h.append(0)
                means.append(None)
                statuses.append("failed_decode")
                continue
            dec_h.append(int(px.shape[0]))
            dec_w.append(int(px.shape[1]))
            # exact: integer pixel sum over all channels / one IEEE division
            means.append(float(px.sum(dtype=np.int64)) / px.size)
            # Mean-pool to a thumb×thumb gray grid → flat feature vector.
            g = px.mean(axis=2) if px.ndim == 3 else px.astype(np.float64)
            ys = np.linspace(0, g.shape[0], self.thumb + 1, dtype=int)
            xs = np.linspace(0, g.shape[1], self.thumb + 1, dtype=int)
            feat = [
                float(g[ys[i] : max(ys[i + 1], ys[i] + 1),
                        xs[j] : max(xs[j + 1], xs[j] + 1)].mean())
                for i in range(self.thumb)
                for j in range(self.thumb)
            ]
            feats.append(feat)
            statuses.append("ok")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "dec_width": pa.array(dec_w, pa.int32()),
                "dec_height": pa.array(dec_h, pa.int32()),
                "mean_val": pa.array(means, pa.float64()),
                "status": pa.array(statuses, pa.string()),
            }
        )


class FrameSample:
    """Actor stage: video payload → N deterministic frame features (stubbed
    decode, real fan-out: one output row per sampled frame)."""

    def __init__(self, fake: bool = False, n_frames: int = 4):
        self.fake = fake
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode unavailable; construct FrameSample(fake=True)"
            )
        out_id, out_frame, out_feat = [], [], []
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            for f in range(self.n_frames):
                seed = stable_hash64((payload or b"") + bytes([f])) & 0xFFFFFFFF
                rng = np.random.default_rng(seed)
                out_id.append(mid)
                out_frame.append(int((dur or 0) * f / max(self.n_frames - 1, 1)))
                out_feat.append(rng.standard_normal(16).astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_ms": pa.array(out_frame, pa.int32()),
                "feature": pa.array(out_feat, pa.list_(pa.float32())),
            }
        )


class AudioChunk:
    """Actor stage: audio payload → per-window chunk features (one output
    row per ``chunk_ms`` window, last window truncated).

    WAV/PCM payloads decode for REAL (stdlib ``wave`` via
    :mod:`xhs_ocr_ray.wav`): windows are cut from the decoded samples and
    each emits exact integer-derived features — ``n_samples``,
    ``peak`` (max |x|), ``zero_crossings`` (sign-bit change count) and
    ``rms`` = sqrt(sum(x²)/n), one libm sqrt over exact integer sums, so
    the SQL oracle is bit-exact. ``feature`` carries
    ``[rms, zero_crossings, peak]`` as float32. Corrupt WAV payloads are
    quarantined ROW-LOCALLY (``status='failed_decode'``), mirroring
    :class:`ImageDecode`.

    Compressed codecs (MP3/AAC/Opus) have no decoder in this container:
    non-WAV payloads raise ``NotImplementedError`` unless ``fake=True``,
    which keeps the duration-derived windowing/fan-out real and fills
    features with seeded noise (plus noise-derived rms/zcr/peak, so the
    schema is identical to the real path)."""

    def __init__(self, fake: bool = False, chunk_ms: int = 1000,
                 n_mels: int = 13):
        self.fake = fake
        self.chunk_ms = chunk_ms
        self.n_mels = n_mels

    def _rows_real(self, payload: bytes) -> list[tuple]:
        from xhs_ocr_ray.wav import decode_wav

        samples, rate = decode_wav(payload)
        cs = max(1, rate * self.chunk_ms // 1000)
        n = len(samples)
        n_chunks = max(1, -(-n // cs))  # ceil; ≥1 even for empty audio
        rows = []
        for c in range(n_chunks):
            x = samples[c * cs: (c + 1) * cs]
            if len(x):
                ss = int((x.astype(np.int64) ** 2).sum())
                rms = float(ss / len(x)) ** 0.5
                neg = x < 0
                zc = int(np.count_nonzero(neg[1:] != neg[:-1]))
                peak = int(np.abs(x).max())
            else:
                rms, zc, peak = 0.0, 0, 0
            rows.append((c * self.chunk_ms, len(x), rms, zc, peak,
                         [rms, float(zc), float(peak)], "ok"))
        return rows

    def _rows_fake(self, payload: bytes, dur: int) -> list[tuple]:
        n_chunks = max(1, -(-dur // self.chunk_ms))  # ceil; ≥1 per clip
        rows = []
        for c in range(n_chunks):
            seed = stable_hash64(payload + b"a" + bytes([c & 0xFF])) & 0xFFFFFFFF
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.n_mels)
            neg = v < 0
            rows.append((
                c * self.chunk_ms, 0,
                float(np.sqrt((v ** 2).mean())),
                int(np.count_nonzero(neg[1:] != neg[:-1])),
                int(np.abs(v).max()),  # noise peak ~N(0,1) → floor to int
                v.astype(np.float32).tolist(), "ok",
            ))
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        from xhs_ocr_ray.wav import is_wav

        out: dict[str, list] = {k: [] for k in (
            "media_id", "chunk_start_ms", "n_samples", "rms",
            "zero_crossings", "peak", "feature", "status")}
        for mid, payload, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            payload = payload or b""
            if is_wav(payload):
                try:
                    rows = self._rows_real(payload)
                except ValueError:
                    # corrupt WAV — quarantine row-locally (class doc)
                    rows = [(0, 0, None, 0, 0, None, "failed_decode")]
            elif self.fake:
                rows = self._rows_fake(payload, dur or 0)
            else:
                raise NotImplementedError(
                    "audio decode beyond WAV/PCM requires a codec library "
                    "not present in this container; WAV decodes natively — "
                    "construct AudioChunk(fake=True) for a deterministic "
                    "stub otherwise (e.g. MP3/AAC payloads)"
                )
            for start, ns, rms, zc, peak, feat, status in rows:
                out["media_id"].append(mid)
                out["chunk_start_ms"].append(start)
                out["n_samples"].append(ns)
                out["rms"].append(rms)
                out["zero_crossings"].append(zc)
                out["peak"].append(peak)
                out["feature"].append(feat)
                out["status"].append(status)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "chunk_start_ms": pa.array(out["chunk_start_ms"], pa.int32()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "rms": pa.array(out["rms"], pa.float64()),
                "zero_crossings": pa.array(out["zero_crossings"], pa.int64()),
                "peak": pa.array(out["peak"], pa.int64()),
                "feature": pa.array(out["feature"], pa.list_(pa.float32())),
                "status": pa.array(out["status"], pa.string()),
            }
        )


def synth_media_table(n: int = 32) -> pa.Table:
    """Deterministic fake media corpus for tests/benches."""
    rows = {
        "media_id": list(range(n)),
        "media_type": ["image" if i % 3 else "video" for i in range(n)],
        "payload": [f"media-{i}".encode() * 8 for i in range(n)],
        "width": [32 + (i % 5) * 16 for i in range(n)],
        "height": [32 + (i % 7) * 8 for i in range(n)],
        "duration_ms": [0 if i % 3 else 4000 + i * 100 for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
