"""Pure-stdlib media codecs (no PIL/cv2 in this container).

Real decoders for the formats the standard library can express:

- PNG: full pixel decode (zlib inflate + scanline unfilter) and a filter-0
  encoder — 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.
- BMP: uncompressed 24/32-bit decode.
- WAV: PCM decode via the ``wave`` module.
- JPEG / GIF: header-only dimension parse (entropy decode is out of scope
  without codec libs; callers get dims + byte stats).

These run inside Arrow-batched mapInPandas kernels (operators/multimodal.py)
so the per-item work scales out by partition. The reference treats media as
opaque blobs with metadata; full decode here goes beyond it so the
training-data pipeline can do real image/audio feature extraction.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Supports bit depth 8, color types 0/2/4/6, interlace 0 (the shapes a
    data pipeline writes; palette/16-bit/Adam7 raise ValueError).
    """
    if not buf.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, width, height, channels = len(_PNG_SIG), 0, 0, 0
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if not width or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev).astype(np.uint8)
        else:  # Sub / Average / Paeth need the already-unfiltered left pixel
            cur = line
            for x in range(stride):
                left = int(cur[x - channels]) if x >= channels else 0
                up = int(prev[x])
                if ftype == 1:
                    cur[x] = (int(line[x]) + left) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(line[x]) + (left + up) // 2) & 0xFF
                elif ftype == 4:
                    ul = int(prev[x - channels]) if x >= channels else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur[x] = (int(line[x]) + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def png_encode(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, channels) array → PNG bytes (filter 0)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    flat = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * c)
    for y in range(h):
        raw.append(0)
        raw += flat[y].tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP


def bmp_decode(buf: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 (h, w, 3|4) array (RGB order)."""
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    width, height = struct.unpack_from("<ii", buf, 18)
    (bpp,) = struct.unpack_from("<H", buf, 28)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp} comp={compression})")
    flip = height > 0
    height = abs(height)
    c = bpp // 8
    stride = (width * c + 3) & ~3
    rows = []
    for y in range(height):
        off = data_off + y * stride
        row = np.frombuffer(buf, dtype=np.uint8, count=width * c, offset=off)
        rows.append(row.reshape(width, c))
    img = np.stack(rows[::-1] if flip else rows)
    # BMP stores BGR(A); return RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
    return img


# ---------------------------------------------------------------------------
# WAV


def wav_decode(buf: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, n_channels, float64 samples in [-1, 1])
    with shape (n_frames, n_channels)."""
    with wave.open(io.BytesIO(buf)) as w:
        rate, nch, sw = w.getframerate(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    elif sw == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return rate, nch, arr.reshape(-1, nch)


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float samples in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return bio.getvalue()


# ---------------------------------------------------------------------------
# header-only dims (formats whose entropy coding needs external libs)


def image_dims(buf: bytes) -> tuple[int, int] | None:
    """(width, height) from the header for PNG/BMP/GIF/JPEG, else None."""
    if buf.startswith(_PNG_SIG) and len(buf) >= 24:
        w, h = struct.unpack(">II", buf[16:24])
        return w, h
    if buf[:2] == b"BM" and len(buf) >= 26:
        w, h = struct.unpack_from("<ii", buf, 18)
        return w, abs(h)
    if buf[:4] in (b"GIF8",) and len(buf) >= 10:
        w, h = struct.unpack_from("<HH", buf, 6)
        return w, h
    if buf[:3] == b"\xff\xd8\xff":
        # scan JPEG markers for a start-of-frame segment
        pos = 2
        while pos + 9 < len(buf):
            if buf[pos] != 0xFF:
                pos += 1
                continue
            marker = buf[pos + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", buf[pos + 5 : pos + 9])
                return w, h
            (seglen,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
            pos += 2 + seglen
    return None


def decode_pixels(buf: bytes) -> np.ndarray | None:
    """Full pixel decode where stdlib allows (PNG/BMP), else None."""
    if buf.startswith(_PNG_SIG):
        return png_decode(buf)
    if buf[:2] == b"BM":
        return bmp_decode(buf)
    return None


# ---------------------------------------------------------------------------
# AVI (RIFF) — uncompressed DIB ('00db') and MJPEG ('00dc') video frames.
# A RIFF chunk walk needs no codec library, so real video-column frame
# sampling works in-container: uncompressed-AVI frames decode fully to
# pixels (DIB = the same bottom-up BGR rows as BMP); MJPEG frames are
# extracted as JPEG bytes with header-parsed dims (entropy decode stays
# out of scope, same contract as standalone JPEGs above).


def avi_encode(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Uncompressed 24-bit AVI from uint8 (h, w, 3) RGB frames.

    Minimal but standard-conformant RIFF: hdrl(avih + strl(strh 'vids'/
    'DIB ', strf BITMAPINFOHEADER)) + movi('00db' DIB data per frame).
    All frames must share one shape. DIB rows are bottom-up BGR padded
    to 4 bytes — exactly the BMP pixel-array layout."""
    if not frames:
        raise ValueError("avi_encode: need at least one frame")
    h, w = frames[0].shape[:2]
    row = (w * 3 + 3) & ~3
    frame_bytes = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("avi_encode: all frames must share one shape")
        bgr = np.ascontiguousarray(f[::-1, :, ::-1], dtype=np.uint8)
        padded = np.zeros((h, row), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        frame_bytes.append(padded.tobytes())
    size_image = row * h

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        size_image * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 index is written, so HASINDEX stays off)
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        size_image,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII4h",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate
            0,  # dwStart
            len(frames),  # dwLength
            size_image,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1)
            0,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, size_image, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking a chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def avi_frames(buf: bytes):
    """AVI bytes → (width, height, bpp, [(fourcc, frame_bytes), ...]).

    Walks RIFF for the strf BITMAPINFOHEADER (dims) and the movi LIST's
    '##db'/'##dc' frame chunks. Raises ValueError on non-AVI input."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = bpp = 0
    frames: list[tuple[bytes, bytes]] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, bpp
        for fourcc, p, size in _riff_chunks(buf, start, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)
            elif fourcc == b"strf" and size >= 40:
                _, bw, bh, _, bits = struct.unpack_from("<IiiHH", buf, p)
                if w == 0:
                    w, h, bpp = bw, abs(bh), bits
            elif len(fourcc) == 4 and fourcc[2:4] in (b"db", b"dc"):
                frames.append((bytes(fourcc), bytes(buf[p : p + size])))

    walk(12, len(buf))
    return w, h, bpp, frames


def dib_decode(data: bytes, w: int, h: int, bpp: int = 24) -> np.ndarray:
    """Raw DIB pixel rows (bottom-up BGR, 4-byte-padded) → uint8 (h, w, 3)
    RGB — the BMP pixel array without the file header."""
    if bpp != 24:
        raise ValueError(f"unsupported DIB bpp={bpp}")
    row = (w * 3 + 3) & ~3
    if len(data) < row * h:
        raise ValueError("DIB data shorter than dims require")
    arr = np.frombuffer(data[: row * h], dtype=np.uint8).reshape(h, row)
    return arr[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
