"""Pure-stdlib media codecs: REAL decode for the formats that need no
external libraries, used by operators/multimodal.py.

Scope (honest): this container has no PIL/ffmpeg/librosa, so the decode
matrix is exactly what the Python standard library + struct parsing can do:

* **BMP** (uncompressed 24-bit BI_RGB) — full pixel decode → grayscale
  stats + pooled-luminance embedding.
* **WAV** (PCM, via stdlib ``wave``) — full sample decode → duration/RMS +
  windowed energy-envelope embedding.
* **GIF** (incl. animated) — header dims + exact frame count by walking the
  block structure (extensions / image descriptors / LZW sub-blocks);
  writer uses the classic "uncompressed LZW" trick (emit literal codes,
  reset the dictionary with CLEAR before it grows past code width).
* **PNG / JPEG** — real header parsing (IHDR / SOF scan) for dimensions;
  pixel decode is out of scope (inflate+unfilter for PNG, DCT for JPEG).
* **MP3 / MP4** — recognized by magic only; decode unsupported.

Every decoder raises :class:`UnsupportedMedia` on formats or encodings it
cannot truly handle — callers map that to an ``unsupported`` status row,
never a fake value.
"""

from __future__ import annotations

import io
import struct
import wave


class UnsupportedMedia(Exception):
    """Raised when a payload cannot be genuinely decoded in-scope."""


# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed
# ---------------------------------------------------------------------------

def make_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Write a 24-bit BI_RGB bottom-up BMP; ``pixel_fn(x, y) -> (r, g, b)``."""
    row_size = (width * 3 + 3) & ~3
    pixel_bytes = row_size * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        row += b"\x00" * (row_size - width * 3)
        rows.append(bytes(row))
    return header + b"".join(rows)


def decode_bmp(raw: bytes) -> tuple[int, int, list[float]]:
    """24-bit BI_RGB BMP → (width, height, row-major grayscale [0..255])."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise UnsupportedMedia("not a BMP")
    offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", raw, 14)
    if hdr_size < 40:
        raise UnsupportedMedia("BMP core header not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", raw, 26)
    if bpp != 24 or compression != 0:
        raise UnsupportedMedia(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if offset + row_size * height > len(raw):
        raise UnsupportedMedia("truncated BMP pixel array")
    gray: list[float] = [0.0] * (width * height)
    for row in range(height):
        y = (height - 1 - row) if bottom_up else row
        base = offset + row * row_size
        for x in range(width):
            b = raw[base + 3 * x]
            g = raw[base + 3 * x + 1]
            r = raw[base + 3 * x + 2]
            gray[y * width + x] = (r + g + b) / 3.0
    return width, height, gray


def pooled_embedding(
    gray: list[float], width: int, height: int, grid: int = 4
) -> list[float]:
    """grid×grid mean-pooled luminance, scaled to [-1, 1]."""
    cells = [[0.0, 0] for _ in range(grid * grid)]
    for y in range(height):
        cy = min(y * grid // height, grid - 1)
        for x in range(width):
            cx = min(x * grid // width, grid - 1)
            cell = cells[cy * grid + cx]
            cell[0] += gray[y * width + x]
            cell[1] += 1
    return [
        round((s / n) / 127.5 - 1.0, 6) if n else 0.0 for s, n in cells
    ]


# ---------------------------------------------------------------------------
# WAV — PCM via stdlib wave
# ---------------------------------------------------------------------------

def make_wav(
    samples: list[int], rate: int = 8000, sampwidth: int = 2
) -> bytes:
    """16-bit mono PCM WAV from integer samples (clamped to int16)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", max(-32768, min(32767, s))) for s in samples
            )
        )
    return buf.getvalue()


def decode_wav(raw: bytes) -> tuple[int, int, list[int]]:
    """PCM WAV → (sample_rate, n_channels, mono-mixed int samples)."""
    try:
        with wave.open(io.BytesIO(raw), "rb") as w:
            rate, nch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
            n = w.getnframes()
            frames = w.readframes(n)
    except (wave.Error, EOFError) as exc:
        raise UnsupportedMedia(f"WAV: {exc}") from exc
    if width != 2:
        raise UnsupportedMedia(f"WAV sample width {width} not supported")
    ints = struct.unpack(f"<{len(frames) // 2}h", frames)
    if nch > 1:  # mix down
        ints = [
            sum(ints[i:i + nch]) // nch for i in range(0, len(ints), nch)
        ]
    return rate, nch, list(ints)


def energy_envelope(samples: list[int], windows: int = 16) -> list[float]:
    """RMS per window, scaled to [-1, 1] against int16 full scale."""
    if not samples:
        return [0.0] * windows
    per = max(1, len(samples) // windows)
    out = []
    for i in range(windows):
        chunk = samples[i * per:(i + 1) * per] or [0]
        rms = (sum(s * s for s in chunk) / len(chunk)) ** 0.5
        out.append(round(min(rms / 32768.0, 1.0) * 2 - 1.0, 6))
    return out


# ---------------------------------------------------------------------------
# GIF — header + block walk (frame count); uncompressed-LZW writer
# ---------------------------------------------------------------------------

def make_gif(
    width: int, height: int, frames: list[list[int]], palette: list[tuple] | None = None
) -> bytes:
    """Animated GIF87a-compatible stream: each frame is a row-major list of
    2-bit palette indices (palette of 4 RGB triples).  Image data uses the
    uncompressed-LZW technique: literal codes only, CLEAR emitted before
    the code width would grow."""
    palette = palette or [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x91, 0, 0)  # 4-entry GCT
    for r, g, b in palette:
        out += bytes((r, g, b))
    for frame in frames:
        # graphic control extension (frame delay) marks animation frames
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes((2,))  # LZW minimum code size (2 bits → codes 0..3)
        codes: list[int] = []
        clear, eoi = 4, 5
        codes.append(clear)
        for i, px in enumerate(frame):
            # emit literal; keep dictionary empty by clearing every 2 codes
            codes.append(px & 3)
            if i % 2 == 1:
                codes.append(clear)
        codes.append(eoi)
        bits = bytearray()
        acc = nbits = 0
        for code in codes:  # all codes fit in the initial 3-bit width
            acc |= code << nbits
            nbits += 3
            while nbits >= 8:
                bits.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            bits.append(acc & 0xFF)
        for i in range(0, len(bits), 255):
            chunk = bits[i:i + 255]
            out += bytes((len(chunk),)) + chunk
        out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def gif_info(raw: bytes) -> tuple[int, int, int]:
    """GIF → (width, height, n_frames) via a real block walk."""
    try:
        return _gif_info(raw)
    except (IndexError, struct.error) as exc:  # truncated mid-structure
        raise UnsupportedMedia(f"GIF: truncated ({exc})") from exc


def _gif_info(raw: bytes) -> tuple[int, int, int]:
    if len(raw) < 13 or raw[:4] != b"GIF8":
        raise UnsupportedMedia("not a GIF")
    width, height, flags = struct.unpack_from("<HHB", raw, 6)
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(raw) and raw[p] != 0:
            p += raw[p] + 1
        return p + 1

    while pos < len(raw):
        b = raw[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            n_frames += 1
            lflags = raw[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
        else:
            raise UnsupportedMedia(f"GIF: unknown block 0x{b:02x}")
    if n_frames == 0:
        raise UnsupportedMedia("GIF: no image descriptors")
    return width, height, n_frames


# ---------------------------------------------------------------------------
# PNG / JPEG — header-only dimensions
# ---------------------------------------------------------------------------

def png_dimensions(raw: bytes) -> tuple[int, int]:
    if len(raw) < 24 or raw[:8] != b"\x89PNG\r\n\x1a\n" or raw[12:16] != b"IHDR":
        raise UnsupportedMedia("not a PNG / missing IHDR")
    w, h = struct.unpack_from(">II", raw, 16)
    return w, h


def jpeg_dimensions(raw: bytes) -> tuple[int, int]:
    """Scan JPEG markers for the first SOFn frame header."""
    if len(raw) < 4 or raw[:3] != b"\xff\xd8\xff":
        raise UnsupportedMedia("not a JPEG")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        marker = raw[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack_from(">H", raw, pos + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(raw):
                break
            h, w = struct.unpack_from(">HH", raw, pos + 5)
            return w, h
        pos += 2 + seglen
    raise UnsupportedMedia("JPEG: no SOF marker found")
