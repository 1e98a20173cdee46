"""Minimal REAL media codecs, pure stdlib+numpy (no PIL/ffmpeg needed).

Round-3 verdict item 4: the multimodal decode kernels were stubs because
codec libraries are absent in this container. PNG and WAV, however, need
nothing beyond ``zlib`` and ``struct``:

- PNG: 8-bit grayscale / gray+alpha / RGB / RGBA, non-interlaced, all five
  scanline filter types on decode (encoder emits filter 0). Palette,
  16-bit, and Adam7 interlace raise ``NotImplementedError`` — genuinely
  exotic for training-data payloads.
- JPEG (round-5): baseline sequential JFIF — Huffman + 8x8 DCT, grayscale
  or YCbCr at 4:4:4/4:2:0/4:2:2, restart intervals. Progressive and
  arithmetic-coded JPEGs raise ``NotImplementedError``; the production
  hook for those is libjpeg-turbo via Pillow.
- WAV: PCM 16-bit little-endian mono/stereo (RIFF/fmt/data chunks).

These are kernel-sized by design: they run inside ``mapInPandas`` batches
(one blob at a time, numpy-vectorized per scanline), so the Spark-side
plumbing in :mod:`pyld_spark.operators.multimodal` is identical between the
fake and real paths. MP4 frame extraction still genuinely requires ffmpeg
and stays stubbed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + typ + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H,W) or (H,W,C) uint8 array as a non-interlaced PNG
    (filter type 0 per scanline)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _CHANNELS_TO_COLOR:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, c = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_TO_COLOR[c], 0, 0, 0)
    # prepend filter byte 0 to each scanline
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    )
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (H,W,C) uint8 array. Supports 8-bit color types
    0/2/4/6, non-interlaced, filters 0-4; verifies chunk CRCs."""
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, header = 8, [], None
    data = bytes(data)
    while pos + 12 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            header = struct.unpack(">IIBBBBB", payload)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
    if header is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = header
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} unsupported (8 only)")
    if color not in _COLOR_TO_CHANNELS:
        raise NotImplementedError(f"color type {color} unsupported (palette?)")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace unsupported")
    c = _COLOR_TO_CHANNELS[color]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    scan = rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        line = scan[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub: prefix-sum per channel lane, mod 256
            lanes = line.reshape(w, c)
            out[y] = np.cumsum(lanes, axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average — sequential in x (left depends on recon)
            rec = out[y]
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                rec[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            rec = out[y]
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                up_left = prev[i - c] if i >= c else 0
                rec[i] = (line[i] + _paeth(int(left), int(prev[i]), int(up_left))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
    return out.astype(np.uint8).reshape(h, w, c)


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize of an (H,W,C) array to
    (target_w, target_h) — pure index math, no interpolation libraries."""
    tw, th = size
    h, w = arr.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return arr[ys][:, xs]


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 array (n,) mono or (n,2) stereo as PCM-16 WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[1] not in (1, 2):
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n_ch = s.shape[1]
    payload = s.tobytes()
    byte_rate = sample_rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV to ((n, channels) int16 array, sample_rate)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif typ == b"data":
            payload = chunk
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM-16 supported (got format {audio_fmt}, {bits}-bit)"
        )
    if n_ch not in (1, 2):
        raise NotImplementedError(f"{n_ch}-channel WAV unsupported")
    samples = np.frombuffer(payload[: (len(payload) // (2 * n_ch)) * 2 * n_ch],
                            dtype="<i2").reshape(-1, n_ch)
    return samples, rate


_Y4M_SIG = b"YUV4MPEG2 "


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode (n,H,W) uint8 (mono) or (n,H,W,3) uint8 (YUV 4:4:4) frames as
    a YUV4MPEG2 stream — the standard uncompressed video interchange format
    (mjpegtools/ffmpeg ``.y4m``), real end to end with zero codec deps."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        cspace = b"Cmono"
    elif a.ndim == 4 and a.shape[3] == 3:
        cspace = b"C444"
    else:
        raise ValueError(f"unsupported frame stack shape {frames.shape}")
    n, h, w = a.shape[:3]
    head = b"%sW%d H%d F%d:%d Ip A1:1 %s\n" % (
        _Y4M_SIG, w, h, fps[0], fps[1], cspace
    )
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        if a.ndim == 3:
            parts.append(a[i].tobytes())
        else:  # planar: all Y, then all U, then all V
            parts.append(np.ascontiguousarray(a[i].transpose(2, 0, 1)).tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Decode a YUV4MPEG2 stream to ((n,H,W,C) uint8 array, (fps_num,
    fps_den)). C420 variants are nearest-upsampled to 4:4:4 (deterministic
    index math); 4:2:2, 16-bit and interlaced field modes raise
    ``NotImplementedError``."""
    data = bytes(data)
    if not data.startswith(_Y4M_SIG):
        raise ValueError("not a YUV4MPEG2 stream (bad signature)")
    nl = data.index(b"\n")
    w = h = None
    fps = (25, 1)
    cspace = "420jpeg"  # the spec default when C is absent
    interlace = "p"
    for tok in data[len(_Y4M_SIG):nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == "C":
            cspace = val
        elif tag == "I":
            interlace = val
    if w is None or h is None:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    if interlace not in ("p", "?"):
        raise NotImplementedError(f"interlaced y4m unsupported (I{interlace})")
    if cspace == "mono":
        plane_dims = [(h, w)]
    elif cspace == "444":
        plane_dims = [(h, w)] * 3
    elif cspace.startswith("420"):
        if h % 2 or w % 2:
            raise ValueError("C420 requires even dimensions")
        plane_dims = [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    else:
        raise NotImplementedError(f"colourspace C{cspace} unsupported")
    frame_bytes = sum(ph * pw for ph, pw in plane_dims)
    pos = nl + 1
    frames = []
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + frame_bytes > len(data):
            raise ValueError("truncated frame payload")
        planes = []
        for ph, pw in plane_dims:
            planes.append(
                np.frombuffer(data[pos:pos + ph * pw], dtype=np.uint8)
                .reshape(ph, pw)
            )
            pos += ph * pw
        if cspace == "mono":
            frames.append(planes[0][:, :, None])
        else:
            if cspace.startswith("420"):
                planes = [planes[0]] + [
                    p.repeat(2, axis=0).repeat(2, axis=1) for p in planes[1:]
                ]
            frames.append(np.stack(planes, axis=2))
    return np.stack(frames) if frames else np.zeros(
        (0, h, w, 1 if cspace == "mono" else 3), dtype=np.uint8
    ), fps


# --- JPEG: baseline sequential JFIF (round-5 verdict item 4) ---------------
#
# Pure struct+numpy baseline JPEG: Huffman entropy coding + 8x8 DCT,
# grayscale or YCbCr with 4:4:4 / 4:2:0 / 4:2:2 subsampling, restart
# intervals, byte stuffing. Progressive (SOF2), arithmetic (SOF9+),
# 12-bit, and hierarchical modes raise NotImplementedError — for
# production web-crawl media the hook is libjpeg-turbo via Pillow, but
# the baseline profile covers the overwhelming majority of real JPEGs.
# The encoder exists so tests can generate fixtures hermetically; like
# the other codecs here this runs one blob at a time inside mapInPandas.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K reference tables (public spec)
_STD_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_STD_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_DCT_C = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)] for u in range(8)
])


def _huff_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scaling mapping (quality 1-100)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(category, amplitude bits) — negatives in one's complement."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    return cat, (v if v > 0 else v + (1 << cat) - 1)


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Quantized 8x8 block (zigzag order) -> entropy stream; returns DC."""
    dc = int(block[0])
    cat, amp = _magnitude(dc - pred)
    code, ln = dc_tab[cat]
    bw.write(code, ln)
    if cat:
        bw.write(amp, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(block)[0])) if np.any(block) else 0
    for i in range(1, 64):
        v = int(block[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, amp = _magnitude(v)
        code, ln = ac_tab[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(amp, cat)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 75,
                         subsampling: str = "444") -> bytes:
    """Encode an (H,W) grayscale or (H,W,3) RGB uint8 array as a baseline
    sequential JFIF JPEG (Annex K tables scaled by ``quality``;
    ``subsampling`` in {'444','420','422'} for color)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"subsampling must be 444/420/422, got {subsampling}")
    h, w = a.shape[:2]
    if not h or not w:
        raise ValueError("empty image")

    qt_l = _quality_scale(_STD_QT_LUM, quality)
    qt_c = _quality_scale(_STD_QT_CHR, quality)
    if gray:
        planes = [a.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        sh, sv = {"444": (1, 1), "420": (2, 2), "422": (2, 1)}[subsampling]
        def _down(p):
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return padded.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        planes = [y - 128.0, _down(cb) - 128.0, _down(cr) - 128.0]
        samp = [(sh, sv), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each plane to its MCU-aligned size and pre-split into blocks
    comp_blocks = []
    for plane, (sh, sv) in zip(planes, samp):
        ph = mcus_y * sv * 8
        pw = mcus_x * sh * 8
        padded = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                        mode="edge")
        comp_blocks.append(padded)

    dc_l, ac_l = _huff_codes(*_DC_LUM), _huff_codes(*_AC_LUM)
    dc_c, ac_c = _huff_codes(*_DC_CHR), _huff_codes(*_AC_CHR)
    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (plane, (sh, sv), qt) in enumerate(
                zip(comp_blocks, samp, qts)
            ):
                dct_q = qt[_ZIGZAG].astype(np.float64)
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = plane[y0:y0 + 8, x0:x0 + 8]
                        coef = _DCT_C @ blk @ _DCT_C.T
                        zz = coef.reshape(64)[_ZIGZAG]
                        q = np.round(zz / dct_q).astype(np.int64)
                        preds[ci] = _encode_block(
                            bw, q, preds[ci],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c,
                        )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)
    for tc_th, (bits, vals) in (
        ((0x00, _DC_LUM), (0x10, _AC_LUM)) if gray else
        ((0x00, _DC_LUM), (0x10, _AC_LUM), (0x01, _DC_CHR), (0x11, _AC_CHR))
    ):
        out += seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3F\x00"
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-stream bit reader with 0xFF00 destuffing and RSTn handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker = None  # non-RST marker encountered mid-scan

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt in (0xD9,):
                # marker: expose padding 1-bits until align_restart handles it
                self.marker = nxt
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def restart(self) -> None:
        """Byte-align, consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        self.marker = None
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, found 0xFF{m:02X}")
        self.pos += 2


def _huff_decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol (inverse of _huff_codes)."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


def _read_symbol(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    for _ in range(16):
        code = (code << 1) | br.bits(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF JPEG to an (H,W,C) uint8 array
    (C=1 grayscale, C=3 RGB). Supports 4:4:4/4:2:0/4:2:2 (any h/v factors
    1-2), restart intervals, per-component quant/Huffman table selection.
    Progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision, and
    hierarchical modes raise NotImplementedError."""
    data = bytes(data)
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    scan_sel = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # 0xFF fill byte(s) before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(
                    payload[p + 1:p + 65], dtype=np.uint8
                ).astype(np.int32)
                qts[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline+extended
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG unsupported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0} (lossless/arithmetic/hierarchical) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan_sel = []
            for si in range(ns):
                cs, tdta = payload[1 + 2 * si], payload[2 + 2 * si]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            pos += seglen
            break
        pos += seglen
    if scan_sel is None:  # loop exhausted or EOI before any SOS
        raise ValueError("no SOS marker found")
    if frame is None:
        raise ValueError("no SOF frame header before scan")

    fh, fw, comps = frame
    if len(scan_sel) != len(comps):
        # a legal baseline stream may carry one scan per component; this
        # decoder only handles the single interleaved scan — decoding just
        # the first scan would yield silently wrong planes, so raise like
        # the other unsupported modes
        raise NotImplementedError(
            "non-interleaved / multi-scan baseline JPEG unsupported"
        )
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id.get(cs)
        if c is None:
            raise ValueError(f"scan references unknown component {cs}")
        order.append((c, huff_dc[td], huff_ac[ta], qts[c["tq"]]))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in comps
    }
    br = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c, dc_tab, ac_tab, qt in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _read_symbol(br, dc_tab)
                        diff = _extend(br.bits(cat), cat) if cat else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        blk = np.zeros(64)
                        blk[_ZIGZAG] = zz
                        coef = blk.reshape(8, 8) * qt
                        pix = _DCT_C.T @ coef @ _DCT_C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0:y0 + 8, x0:x0 + 8] = pix

    # upsample each component to full resolution (pixel replication) + crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG unsupported")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
