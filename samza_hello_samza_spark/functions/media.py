"""Pure-python media codecs for the multimodal operators.

The container ships no PIL/librosa/ffmpeg, but the common container
formats have simple enough framing that real header parsing — and for
PNG/WAV, real pixel/sample transforms — need nothing beyond ``zlib``
and ``struct``. This keeps ``multimodal_decode`` / ``multimodal_resize``
honest: actual bytes in, actual dimensions/samples out, verified
against committed fixture files in tests.

Supported:

- PNG: chunk walk, IHDR parse, full decode of 8-bit RGB/RGBA
  scanlines (all five row filters), nearest-neighbor resize,
  re-encode (filter 0, one zlib stream).
- JPEG: marker scan to the SOF frame header for (width, height).
- GIF: logical-screen descriptor for (width, height).
- WAV: RIFF chunk walk, fmt/data parse, decimation resample
  (keep-every-k-th frame, rate scaled so duration is preserved).

Anything else raises ``UnknownMediaError`` — callers decide whether to
fall back (the operators keep a clearly-labeled deterministic fake for
opaque payloads, e.g. video, so unknown formats never crash the job).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

PNG_SIG = b"\x89PNG\r\n\x1a\n"


class UnknownMediaError(ValueError):
    """Payload is not one of the formats this module can parse."""


@dataclass(frozen=True)
class MediaInfo:
    format: str  # png / jpeg / gif / wav
    width: int | None = None
    height: int | None = None
    channels: int | None = None
    sample_rate: int | None = None
    duration_ms: int | None = None


# --------------------------------------------------------------------------
# header parsing
# --------------------------------------------------------------------------


def _png_chunks(b: bytes):
    pos = len(PNG_SIG)
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return


def parse_png(b: bytes) -> MediaInfo:
    if not b.startswith(PNG_SIG):
        raise UnknownMediaError("not a PNG")
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack_from(">IIBB", data, 0)
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
            return MediaInfo("png", width=w, height=h, channels=channels)
    raise UnknownMediaError("PNG without IHDR")


def parse_jpeg(b: bytes) -> MediaInfo:
    if not b.startswith(b"\xff\xd8"):
        raise UnknownMediaError("not a JPEG")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _, h, w, ncomp = struct.unpack_from(">BHHB", b, pos + 4)
            return MediaInfo("jpeg", width=w, height=h, channels=ncomp)
        pos += 2 + seglen
    raise UnknownMediaError("JPEG without SOF")


def parse_gif(b: bytes) -> MediaInfo:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnknownMediaError("not a GIF")
    w, h = struct.unpack_from("<HH", b, 6)
    return MediaInfo("gif", width=w, height=h)


def gif_frames(b: bytes) -> list[tuple[int, bytes]]:
    """Split an (animated) GIF into standalone single-frame GIFs.

    Returns ``[(pts_ms, frame_gif_bytes), ...]`` with cumulative
    presentation timestamps from each frame's Graphic Control
    Extension delay. This is a pure *block-structure* walk (header /
    extensions / image descriptors / sub-block chains) — frame
    boundaries in GIF are delimited, so splitting needs no LZW pixel
    decode, exactly like keyframe-splitting a video container without
    running its codec. Each emitted frame is a valid GIF: shared
    header + logical screen descriptor + global color table, the
    frame's own GCE (if any), its image block, trailer.
    """
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnknownMediaError("not a GIF")
    flags = b[10]
    gct_len = (2 << (flags & 7)) * 3 if flags & 0x80 else 0
    head_end = 13 + gct_len
    head = b[:head_end]

    frames: list[tuple[int, bytes]] = []
    pts_ms = 0
    pos = head_end
    pending_ext = b""  # extensions seen since the last image block
    pending_delay = 0

    def _sub_blocks_end(p: int) -> int:
        while b[p] != 0:
            p += 1 + b[p]
        return p + 1

    while pos < len(b):
        marker = b[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-block chain
            label = b[pos + 1]
            end = _sub_blocks_end(pos + 2)
            if label == 0xF9 and b[pos + 2] >= 4:  # Graphic Control Ext
                delay_cs = struct.unpack_from("<H", b, pos + 4)[0]
                pending_delay = delay_cs * 10
            pending_ext += b[pos:end]
            pos = end
        elif marker == 0x2C:  # image descriptor
            iflags = b[pos + 9]
            lct_len = (2 << (iflags & 7)) * 3 if iflags & 0x80 else 0
            data_start = pos + 10 + lct_len + 1  # + LZW min-code-size byte
            end = _sub_blocks_end(data_start)
            frames.append((pts_ms, head + pending_ext + b[pos:end] + b"\x3b"))
            pts_ms += pending_delay
            pending_ext = b""
            pending_delay = 0
            pos = end
        else:
            raise UnknownMediaError(f"unknown GIF block 0x{marker:02x}")
    return frames


def _wav_chunks(b: bytes):
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def parse_wav(b: bytes) -> MediaInfo:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise UnknownMediaError("not a WAV")
    channels = rate = bits = None
    n_frames = 0
    for cid, off, size in _wav_chunks(b):
        if cid == b"fmt ":
            _, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", b, off
            )
        elif cid == b"data" and channels:
            block = channels * (bits // 8)
            n_frames = size // block if block else 0
    if not (channels and rate):
        raise UnknownMediaError("WAV without fmt chunk")
    return MediaInfo(
        "wav",
        channels=channels,
        sample_rate=rate,
        duration_ms=int(n_frames * 1000 // rate),
    )


def parse_media(b: bytes) -> MediaInfo:
    """Dispatch on magic bytes; UnknownMediaError if nothing matches."""
    for parser in (parse_png, parse_jpeg, parse_gif, parse_wav):
        try:
            return parser(b)
        except (UnknownMediaError, struct.error, IndexError, KeyError):
            continue
    raise UnknownMediaError(f"unrecognized payload ({b[:8]!r}...)")


# --------------------------------------------------------------------------
# PNG pixel codec (8-bit RGB / RGBA)
# --------------------------------------------------------------------------


def png_encode(rows: list[bytes], width: int, height: int, channels: int = 3) -> bytes:
    """Minimal PNG writer: filter 0 rows, one zlib IDAT."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    out = [PNG_SIG]
    for ctype, data in ((b"IHDR", ihdr), (b"IDAT", zlib.compress(raw, 9)), (b"IEND", b"")):
        out.append(struct.pack(">I", len(data)) + ctype + data)
        out.append(struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    return b"".join(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(b: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Decode 8-bit non-interlaced RGB/RGBA/gray PNG → (w, h, channels, rows).

    Implements all five scanline filters per the PNG spec, so it reads
    PNGs from any conforming encoder, not just ``png_encode``.
    """
    info = parse_png(b)
    w, h, ch = info.width, info.height, info.channels
    idat = b"".join(data for ctype, data in _png_chunks(b) if ctype == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        rows.append(line)
        prev = line
    return w, h, ch, rows


def png_resize_nearest(b: bytes, box: int) -> bytes:
    """Fit-within-``box`` nearest-neighbor resize; returns a real PNG."""
    w, h, ch, rows = png_decode(b)
    scale = min(1.0, box / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    out_rows = []
    for y in range(nh):
        src = rows[min(h - 1, y * h // nh)]
        line = bytearray(nw * ch)
        for x in range(nw):
            sx = min(w - 1, x * w // nw) * ch
            line[x * ch : (x + 1) * ch] = src[sx : sx + ch]
        out_rows.append(bytes(line))
    return png_encode(out_rows, nw, nh, ch)


# --------------------------------------------------------------------------
# WAV sample codec (PCM)
# --------------------------------------------------------------------------


def wav_encode(frames: bytes, channels: int, sample_rate: int, bits: int = 16) -> bytes:
    block = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _wav_pcm(b: bytes) -> tuple[int, int, int, bytes]:
    """(channels, rate, bits, frames) of a PCM WAV."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise UnknownMediaError("not a WAV")
    channels = rate = bits = None
    frames = b""
    for cid, off, size in _wav_chunks(b):
        if cid == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, off)
        elif cid == b"data":
            frames = b[off : off + size]
    if not (channels and rate):
        raise UnknownMediaError("WAV without fmt chunk")
    return channels, rate, bits, frames


def wav_window(b: bytes, idx: int, n_windows: int) -> bytes:
    """Window ``idx`` of ``n_windows`` equal slices, as a standalone WAV."""
    channels, rate, bits, frames = _wav_pcm(b)
    block = channels * (bits // 8)
    n_frames = len(frames) // block
    lo = (idx * n_frames // n_windows) * block
    hi = ((idx + 1) * n_frames // n_windows) * block
    return wav_encode(frames[lo:hi], channels, rate, bits)


def wav_decimate(b: bytes, factor: int) -> bytes:
    """Resample by decimation: keep every ``factor``-th PCM frame and
    divide the sample rate, so duration is preserved. Real transform,
    real header rewrite — no interpolation (fine for downsampling
    checks; swap in a polyphase filter for production audio)."""
    channels, rate, bits, frames = _wav_pcm(b)
    block = channels * (bits // 8)
    kept = b"".join(
        frames[i : i + block] for i in range(0, len(frames) - block + 1, block * factor)
    )
    return wav_encode(kept, channels, max(1, rate // factor), bits)
