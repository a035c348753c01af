"""Pure-Python baseline JPEG codec (numpy — no image libs in the env).

The pixel-decode analog of the reference's PIL/cv2 ingestion
(core/run.py:660-676 ``Image.open`` → ``np.asarray``) for the web's
dominant photo format: a JFIF byte payload becomes a uint8 ndarray for the
multimodal feature stages — retiring the last image ``fake=True`` stub in
:mod:`xhs_ocr_ray.stages.multimodal`.

Scope (documented, deliberate):

- baseline sequential DCT (SOF0/SOF1), 8-bit samples, 1 or 3 components,
  arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 / …) with nearest
  upsampling, restart markers, multi-table DQT/DHT segments;
- progressive (SOF2), arithmetic coding and 12-bit depth raise
  ``ValueError``/``NotImplementedError`` loudly;
- Huffman decode via a flat 16-bit peek table (numpy) — symbol loop in
  Python, but dequant/dezigzag/IDCT/upsample/color-convert run batched
  over ALL blocks at once (einsum on an (n, 8, 8) stack);
- any structural violation raises ``ValueError`` — callers quarantine
  row-locally (the engine pattern).

The encoder exists for the deterministic synthetic corpus and fixtures: it
emits standards-valid baseline JFIF (canonical multi-length Huffman
tables, byte stuffing, optional 4:2:0 chroma subsampling, restart
intervals) so the decoder — ours included — is exercised against real
stream structure. With the default flat quant table (all 1s) a
block-uniform image round-trips EXACTLY: each 8×8 block is DC-only, the DC
coefficient ``8·(v−128)`` is an exact integer, and the IDCT of a DC-only
block is uniform to ~1e-13 before the final round — the bit-exact SQL
oracle for ``jpeg_features`` rests on this.
"""

from __future__ import annotations

import struct

import numpy as np

# natural-order index of the i-th zigzag coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_matrix()          # forward: F = C @ f @ C.T
_CT = _C.T                  # inverse: f = C.T @ F @ C


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

class _HuffTable:
    """Canonical JPEG Huffman table with a flat 16-bit peek LUT."""

    __slots__ = ("lut_sym", "lut_len", "enc")

    def __init__(self, bits: list[int], values: bytes):
        if sum(bits) != len(values):
            raise ValueError("DHT: count/value length mismatch")
        self.lut_sym = np.zeros(1 << 16, dtype=np.uint8)
        self.lut_len = np.zeros(1 << 16, dtype=np.uint8)
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = values[k]
                k += 1
                if code >= (1 << length):
                    raise ValueError("DHT: code space overflow")
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.lut_sym[lo:hi] = sym
                self.lut_len[lo:hi] = length
                self.enc[sym] = (code, length)
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes; reads past the
    end return 0 bits (the final-byte padding convention)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def huff(self, tbl: _HuffTable) -> int:
        self._fill(16)
        peek = (self.acc >> (self.nbits - 16)) & 0xFFFF
        length = int(tbl.lut_len[peek])
        if length == 0:
            raise ValueError("invalid Huffman code in entropy stream")
        self.nbits -= length
        return int(tbl.lut_sym[peek])

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def _split_scan(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start`` → de-stuffed restart segments +
    offset of the terminating marker."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:           # stuffed FF
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytearray())
            i += 2
        else:                    # real marker: end of scan
            return [bytes(s) for s in segs], i
    return [bytes(s) for s in segs], n


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 array, ``(h, w)`` gray or ``(h, w, 3)``
    RGB. Raises ``ValueError`` on corrupt/unsupported streams."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        marker = payload[i + 1] if i + 1 < n else 0
        i += 2
        if marker == 0xD9:       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue             # standalone
        if i + 2 > n:
            raise ValueError("truncated marker segment")
        seg_len = struct.unpack(">H", payload[i:i + 2])[0]
        seg = payload[i + 2:i + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated marker segment body")
        if marker == 0xDB:       # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:           # 16-bit table
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                if len(vals) != 64:
                    raise ValueError("DQT: truncated table")
                qt[tq] = vals.astype(np.int64)       # zigzag order
        elif marker == 0xC4:     # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = seg[p + 17:p + 17 + cnt]
                p += 17 + cnt
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq_ = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq_))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:     # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 15))
            segs, _end = _split_scan(payload, i + seg_len)
            return _decode_scan(frame, scan, qt, huff_dc, huff_ac,
                                segs, restart_interval)
        i += seg_len
    raise ValueError("no SOS marker found")


def _decode_scan(frame, scan, qt, huff_dc, huff_ac, segs, ri) -> np.ndarray:
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero image dimension")
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []  # (comp_index, hs, vs, tq, dc_tbl, ac_tbl)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        hs, vs, tq_ = by_id[cs]
        idx = [c[0] for c in comps].index(cs)
        try:
            order.append((idx, hs, vs, tq_, huff_dc[td], huff_ac[ta]))
        except KeyError:
            raise ValueError("scan references missing Huffman table") from None
    if len(order) != len(comps):
        raise ValueError("only single interleaved scans supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if ri == 0:
        ri = mcus_x * mcus_y

    # per-component zigzag coefficient collectors
    zz: list[list] = [[] for _ in order]
    readers = [_BitReader(s) for s in segs]
    seg_i = 0
    preds = [0] * len(order)
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if mcu % ri == 0 and mcu > 0:
            seg_i += 1
            if seg_i >= len(readers):
                raise ValueError("missing restart segment")
            preds = [0] * len(order)
        br = readers[seg_i]
        for ci, (_idx, hs, vs, _tq, dtbl, atbl) in enumerate(order):
            for _b in range(hs * vs):
                blk = np.zeros(64, dtype=np.int64)
                t = br.huff(dtbl)
                preds[ci] += _extend(br.receive(t), t)
                blk[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = br.huff(atbl)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = _extend(br.receive(s), s)
                    k += 1
                zz[ci].append(blk)

    planes = []
    for ci, (_idx, hs, vs, tq_, _d, _a) in enumerate(order):
        if tq_ not in qt:
            raise ValueError(f"missing quant table {tq_}")
        coef_zz = np.stack(zz[ci]) * qt[tq_][None, :]     # dequant, zigzag
        nat = np.zeros_like(coef_zz)
        nat[:, _ZIGZAG] = coef_zz                         # dezigzag
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ij,njk,kl->nil", _CT, blocks, _C) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        # blocks arrive MCU-major: (mcu_y, mcu_x, vs, hs) of 8×8 tiles
        grid = pix.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
        plane = grid.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcus_y * vs * 8, mcus_x * hs * 8)
        # crop to the component's true extent, then upsample to full size
        ch = -(-h * vs // vmax)
        cw = -(-w * hs // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    if len(planes) == 3:
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"unsupported component count {len(planes)}")


# --------------------------------------------------------------------------
# Encoder (fixture writer)
# --------------------------------------------------------------------------

# canonical multi-length tables (NOT the Annex K defaults — deliberately
# ours, so the decoder's canonical-table construction is exercised):
# DC: categories 0-11 over lengths 2-6; AC: common symbols short, the full
# remaining alphabet at 16 bits (Kraft sum < 1, all-ones code unused).
_ENC_DC_BITS = [0, 1, 2, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_ENC_AC_SHORT = [0x00, 0x01, 0x02, 0x03, 0x11, 0x12,
                 0x21, 0x31, 0x04, 0x13, 0x22, 0x41, 0x05, 0x51]
_ENC_AC_BITS = [0, 2, 0, 4, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                256 - len(_ENC_AC_SHORT)]
_ENC_AC_VALS = bytes(_ENC_AC_SHORT
                     + [s for s in range(256) if s not in _ENC_AC_SHORT])


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zzblk: np.ndarray, pred: int,
                  dc: _HuffTable, ac: _HuffTable) -> int:
    diff = int(zzblk[0]) - pred
    t = _category(diff)
    bw.put(*dc.enc[t])
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zzblk)[0])) if np.any(zzblk[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zzblk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac.enc[0xF0])  # ZRL
            run -= 16
        s = _category(v)
        bw.put(*ac.enc[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.put(*ac.enc[0x00])  # EOB
    return int(zzblk[0])


def _plane_zz_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) → (n, 64) quantized
    zigzag coefficient blocks, raster block order."""
    hh, ww = plane.shape
    f = plane.astype(np.float64) - 128.0
    tiles = f.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    blocks = tiles.reshape(-1, 8, 8)
    coef = np.einsum("ij,njk,kl->nil", _C, blocks, _CT).reshape(-1, 64)
    zz = coef[:, _ZIGZAG]
    return np.round(zz / q[None, :]).astype(np.int64)


def _pad_to(img: np.ndarray, mh: int, mw: int) -> np.ndarray:
    ph = (-img.shape[0]) % mh
    pw = (-img.shape[1]) % mw
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, *, quant: int | np.ndarray = 1,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 image (``(h, w)`` gray or ``(h, w, 3)`` RGB) → baseline JFIF
    bytes. ``quant`` is a scalar or a 64-long zigzag table applied to every
    component; the default all-1s table makes block-uniform images
    round-trip exactly. ``subsampling``: "444" or "420" (RGB only)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    q = (np.full(64, int(quant), dtype=np.int64)
         if np.isscalar(quant) else np.asarray(quant, dtype=np.int64))
    if q.shape != (64,) or (q < 1).any() or (q > 255).any():
        raise ValueError("quant must be a scalar or 64 values in 1..255")

    dc_tbl = _HuffTable(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tbl = _HuffTable(_ENC_AC_BITS, _ENC_AC_VALS)

    if gray:
        planes = [_pad_to(img, 8, 8)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = (128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1]
              + 0.5 * rgb[..., 2])
        cr = (128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1]
              - 0.081312 * rgb[..., 2])
        y, cb, cr = (np.clip(np.round(p), 0, 255).astype(np.uint8)
                     for p in (y, cb, cr))
        if subsampling == "420":
            cb2 = _pad_to(cb, 2, 2).astype(np.float64)
            cr2 = _pad_to(cr, 2, 2).astype(np.float64)
            cb = np.clip(np.round(
                (cb2[0::2, 0::2] + cb2[0::2, 1::2]
                 + cb2[1::2, 0::2] + cb2[1::2, 1::2]) / 4.0), 0, 255
            ).astype(np.uint8)
            cr = np.clip(np.round(
                (cr2[0::2, 0::2] + cr2[0::2, 1::2]
                 + cr2[1::2, 0::2] + cr2[1::2, 1::2]) / 4.0), 0, 255
            ).astype(np.uint8)
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [_pad_to(y, 16, 16), _pad_to(cb, 8, 8),
                      _pad_to(cr, 8, 8)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [_pad_to(p, 8, 8) for p in (y, cb, cr)]

    # quantized zigzag blocks per component, in raster block order
    comp_zz = [_plane_zz_blocks(p, q) for p in planes]

    out = bytearray(b"\xff\xd8")                          # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"          # APP0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(int(v) for v in q)                        # DQT (table 0)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in ((0, _ENC_DC_BITS, _ENC_DC_VALS),
                           (1, _ENC_AC_BITS, _ENC_AC_VALS)):
        body = bytes([tc << 4]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bx = [p.shape[1] // 8 for p in planes]  # blocks per row per component
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for v in range(vs):
                    for hh in range(hs):
                        bi = (my * vs + v) * bx[ci] + (mx * hs + hh)
                        preds[ci] = _encode_block(
                            bw, comp_zz[ci][bi], preds[ci], dc_tbl, ac_tbl)
            mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
