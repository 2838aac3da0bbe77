"""Pure-python image decode for the multimodal pipeline.

The container ships no PIL/ffmpeg, but none of the critical paths need
native libs: this module implements a real encoder/decoder for
non-interlaced 8-bit PNG (stdlib zlib; color types 0 grayscale / 2 RGB /
6 RGBA, all five scanline filters), binary PPM (P6), BMP encode/decode
(numpy; 8-bit palette / 24 / 32 bpp, bottom-up and top-down), plus
nearest-neighbor resize and per-channel feature extraction. sniff_decode
also routes JPEG — baseline AND progressive — to snacktory_spark.jpeg
and GIF to snacktory_spark.gif (both cross-validated against Java
ImageIO); WAV/Y4M live in snacktory_spark.av.

PNG format per the public spec (RFC 2083): 8-byte signature, chunked
layout (IHDR/IDAT/IEND + CRC32), IDAT = zlib-compressed scanlines, each
prefixed by a filter byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


class ImageError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """8-bit non-interlaced PNG from raw row-major samples (filter 0)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ImageError("pixel buffer size mismatch")
    stride = width * channels
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw row-major samples). Raises
    ImageError on anything outside the supported subset."""
    if not data.startswith(PNG_SIG):
        raise ImageError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise ImageError("truncated chunk")
        crc = data[pos + 8 + length:pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != (
                zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ImageError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            if len(payload) != 13:
                raise ImageError("malformed IHDR")
            width, height, bit_depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8:
                raise ImageError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ImageError(f"unsupported color type {color_type}")
            if color_type == 4:
                raise ImageError("gray+alpha not supported")
            if interlace != 0:
                raise ImageError("interlaced PNG not supported")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or channels is None:
        raise ImageError("missing IHDR")
    if width == 0 or height == 0:
        raise ImageError("zero-dimension image")
    stride = width * channels
    expected = (stride + 1) * height
    if expected > (1 << 28):
        raise ImageError("image dimensions exceed the decode cap")
    try:
        # bounded inflate: a crafted IDAT must not be able to OOM the
        # executor (decompression bomb) — the exact output size is known
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected)
        if d.unconsumed_tail or d.decompress(b"", 1):
            raise ImageError("IDAT inflates past the declared image size")
    except zlib.error as e:
        raise ImageError(f"corrupt IDAT: {e}") from None
    if len(raw) != expected:
        raise ImageError("scanline data size mismatch")

    out = bytearray(stride * height)
    prev = bytearray(stride)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                above_left = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], above_left)) & 0xFF
        else:
            raise ImageError(f"unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# PPM (P6 binary)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: bytes, width: int, height: int) -> bytes:
    if len(pixels) != width * height * 3:
        raise ImageError("pixel buffer size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    if not data.startswith(b"P6"):
        raise ImageError("not a binary PPM")
    # header: magic, width, height, maxval, single whitespace, then raster
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            raise ImageError("truncated PPM header")
        if data[pos:pos + 1] == b"#":  # comment to end of line
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ImageError("truncated PPM header")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        try:
            parts.append(int(data[start:pos]))
        except ValueError:
            raise ImageError("malformed PPM header token") from None
    pos += 1  # the single whitespace after maxval
    width, height, maxval = parts
    if maxval != 255:
        raise ImageError(f"unsupported maxval {maxval}")
    raster = data[pos:pos + width * height * 3]
    if len(raster) != width * height * 3:
        raise ImageError("truncated raster")
    return width, height, 3, raster


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------

def encode_bmp24(pixels: bytes, width: int, height: int,
                 top_down: bool = False) -> bytes:
    """Minimal 24-bit BMP writer from raw RGB samples (the one BMP
    writer in the repo — tests and fake-media payloads share it)."""
    import numpy as np
    if len(pixels) != width * height * 3:
        raise ImageError("pixel buffer size mismatch")
    img = np.frombuffer(pixels, np.uint8).reshape(height, width, 3)
    row = (width * 3 + 3) & ~3
    body = bytearray()
    for r in (img if top_down else img[::-1]):
        line = r[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row - len(line))
    return (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width,
                          -height if top_down else height,
                          1, 24, 0, len(body), 2835, 2835, 0, 0)
            + bytes(body))


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Uncompressed BMP (BITMAPINFOHEADER+, 8-bit palette / 24 / 32 bpp)
    → (width, height, 3, RGB bytes). Bottom-up and top-down rows, 4-byte
    row padding, BGRA palette entries — the spec's required core."""
    import numpy as np
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hsz,) = struct.unpack("<I", data[14:18])
    if hsz < 40:
        raise ImageError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    (comp,) = struct.unpack("<I", data[30:34])
    if comp not in (0, 3):  # BI_RGB / BI_BITFIELDS-with-default-masks
        raise ImageError(f"compressed BMP (BI_ compression {comp}) "
                         "not supported")
    if comp == 3:
        # BI_BITFIELDS is only defined for 16/32 bpp; we support the
        # 32-bpp case and ONLY when the mask words spell the default
        # BGRA layout the decode below assumes — anything else would
        # silently swap channels (ADVICE r3).
        if bpp != 32:
            raise ImageError("BI_BITFIELDS BMP supported at 32 bpp only")
        if len(data) < 66:
            raise ImageError("truncated BMP BITFIELDS masks")
        rm, gm, bm = struct.unpack("<III", data[54:66])
        am = (struct.unpack("<I", data[66:70])[0]
              if hsz >= 56 and len(data) >= 70 else 0)
        if ((rm, gm, bm) != (0x00FF0000, 0x0000FF00, 0x000000FF)
                or am not in (0, 0xFF000000)):
            raise ImageError("BI_BITFIELDS masks differ from the "
                             "default BGRA layout")
    top_down = h < 0
    h = abs(h)
    if w < 1 or h < 1 or w * h > (1 << 24):
        raise ImageError("BMP dimensions out of bounds")
    if bpp in (24, 32):
        bypp = bpp // 8
        row = (w * bypp + 3) & ~3
        if off + row * h > len(data):
            raise ImageError("truncated BMP pixel data")
        arr = np.frombuffer(data[off:off + row * h],
                            np.uint8).reshape(h, row)
        px = arr[:, :w * bypp].reshape(h, w, bypp)
        rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    elif bpp == 8:
        pal_bytes = off - 14 - hsz
        n = min(pal_bytes // 4, 256)
        if n < 1:
            raise ImageError("8-bit BMP without palette")
        if 14 + hsz + 4 * n > len(data):
            raise ImageError("truncated BMP palette")
        pal = np.frombuffer(data[14 + hsz:14 + hsz + 4 * n],
                            np.uint8).reshape(n, 4)[:, 2::-1]  # BGRX->RGB
        row = (w + 3) & ~3
        if off + row * h > len(data):
            raise ImageError("truncated BMP pixel data")
        idx = np.frombuffer(data[off:off + row * h],
                            np.uint8).reshape(h, row)[:, :w]
        if int(idx.max()) >= n:
            raise ImageError("BMP palette index out of range")
        rgb = pal[idx]
    else:
        raise ImageError(f"{bpp}-bpp BMP not supported (8/24/32 only)")
    if not top_down:
        rgb = rgb[::-1]
    return w, h, 3, np.ascontiguousarray(rgb).tobytes()


def sniff_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode by magic bytes; EVERY failure mode is ImageError (the Spark
    decode path catches exactly that — a leaked struct.error/ValueError
    would fail the executor task)."""
    try:
        if data.startswith(PNG_SIG):
            return decode_png(data)
        if data.startswith(b"P6"):
            return decode_ppm(data)
        if data.startswith(b"\xFF\xD8"):
            from .jpeg import decode_jpeg  # lazy: needs numpy
            return decode_jpeg(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import decode_gif
            return decode_gif(data)
        if data.startswith(b"BM") and len(data) >= 54:
            return decode_bmp(data)
    except ImageError:
        raise
    except (ValueError, struct.error, OverflowError, MemoryError,
            IndexError) as e:
        raise ImageError(f"malformed image: {type(e).__name__}: {e}") from None
    raise ImageError("unsupported image format "
                     "(supported: PNG, JPEG, GIF, BMP, PPM/P6)")


def resize_nearest(pixels: bytes, width: int, height: int, channels: int,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample (the cheap thumbnail path)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d:d + channels] = pixels[s:s + channels]
    return bytes(out)


def image_features(pixels: bytes, width: int, height: int,
                   channels: int) -> list[float]:
    """Per-channel mean/std + 4x4 grayscale thumbnail = 2*channels + 16
    floats, all in [0, 1] — a deterministic, real feature vector."""
    n = width * height
    feats: list[float] = []
    for c in range(channels):
        vals = pixels[c::channels]
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / n
        feats.append(mean / 255.0)
        feats.append((var ** 0.5) / 255.0)
    # grayscale 4x4 thumbnail
    if channels >= 3:
        gray = bytes((pixels[i] * 299 + pixels[i + 1] * 587
                      + pixels[i + 2] * 114) // 1000
                     for i in range(0, len(pixels), channels))
    else:
        gray = pixels[::channels]
    thumb = resize_nearest(gray, width, height, 1, 4, 4)
    feats.extend(v / 255.0 for v in thumb)
    return feats
