"""From-scratch PNG decode/encode (stdlib zlib + numpy) for the multimodal
column — makes ONE real image codec exist end-to-end in-sandbox, the same
posture as the from-scratch WARC/bs4/DOM/PDF work. JPEG/audio/video stay
honestly injectable (``multimodal.ops.set_image_decoder``).

Implements the published PNG spec (RFC 2083 / ISO 15948): chunk framing
with length+type+CRC, IHDR, PLTE, concatenated IDAT → zlib inflate, and all
five scanline filters (None/Sub/Up/Average/Paeth). Supported honestly:
bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA), no interlace. Out of scope → :class:`PngError` (Adam7 interlace,
1/2/4/16-bit depths), which the decode stage captures per-row as
``decode_error`` data — a poisoned payload never kills the stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != zlib.crc32(ctype + body):
            raise PngError(f"bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    bpp = channels
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise PngError("IDAT too short for image dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int32)
        pos += stride + 1
        p = prev.astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — fully vectorized
            row = (row + p) & 0xFF
        elif ftype == 1:  # Sub — sequential in x
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + p[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(p[i])
                c = int(p[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[y] = row.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, channels)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (height, width, channels). channels follows
    the color type (palette expands to RGB)."""
    if not data or data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    width = height = None
    color_type = depth = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    if depth != 8:
        raise PngError(f"unsupported bit depth {depth} (only 8)")
    if interlace != 0:
        raise PngError("Adam7 interlace unsupported")
    if color_type not in _CHANNELS:
        raise PngError(f"unknown color type {color_type}")
    if not idat:
        raise PngError("missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT stream: {e}") from e
    img = _unfilter(raw, width, height, _CHANNELS[color_type])
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        img = pal[img.reshape(height, width)]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, c∈{1,2,3,4}) → PNG bytes (filter 0 rows,
    one IDAT). The test-fixture/sink half of the codec."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise PngError(f"cannot encode {c}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_image_decoder(data: bytes) -> tuple[int, int, list[float]]:
    """The :mod:`multimodal.ops` decoder contract for PNG payloads:
    bytes → (width, height, 8-dim feature vector). Features are per-channel
    means (4, absent → 0) + per-channel stds (4), all scaled to [0, 1] —
    the deterministic, resolution-independent stats a curation pass filters
    on (all-black/all-white detection, contrast gates)."""
    img = decode_png(data)
    h, w, c = img.shape
    f = img.reshape(-1, c).astype(np.float64) / 255.0
    means = [float(f[:, i].mean()) if i < c else 0.0 for i in range(4)]
    stds = [float(f[:, i].std()) if i < c else 0.0 for i in range(4)]
    return w, h, [round(v, 6) for v in means + stds]
