"""Minimal REAL media codecs, pure stdlib+numpy (no PIL/ffmpeg needed).

Round-3 verdict item 4: the multimodal decode kernels were stubs because
codec libraries are absent in this container. PNG and WAV, however, need
nothing beyond ``zlib`` and ``struct``:

- PNG: 8-bit grayscale / gray+alpha / RGB / RGBA, non-interlaced, all five
  scanline filter types on decode (encoder emits filter 0). Palette,
  16-bit, and Adam7 interlace raise ``NotImplementedError`` — genuinely
  exotic for training-data payloads.
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
