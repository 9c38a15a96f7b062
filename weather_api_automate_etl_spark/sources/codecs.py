"""Pure-NumPy image codecs: binary PPM (P6) and 24-bpp BMP.

The container ships no PIL/ffmpeg, but these two formats are simple enough
to decode with ``struct`` + NumPy alone — which gives the multimodal
pipeline (sources/multimodal.py) one REAL end-to-end decode path next to
the documented stub seam. Everything here is deterministic and
byte-exact, so decode results are oracle-checkable when the payloads are
generated from known parameters.

Formats (public specs):
- PPM P6: ASCII header ``P6 <w> <h> <maxval>`` with ``#`` comments and
  arbitrary whitespace, then ``w*h*3`` raw RGB bytes (maxval <= 255).
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp, uncompressed (BI_RGB), rows stored bottom-up and padded to a
  4-byte boundary, pixels in BGR order.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {pixels.shape}")
    h, w, _ = pixels.shape
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def _ppm_header_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset_past_single_ws)."""
    toks: list[int] = []
    i = 2  # past b"P6"
    cur = b""
    while len(toks) < n:
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[i : i + 1]
        if c == b"#":
            # a comment terminates the current token (the spec lets comments
            # butt directly against tokens: "255# comment")
            if cur:
                toks.append(int(cur))
                cur = b""
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            if not c.isdigit():
                raise ValueError(f"bad PPM header byte {c!r}")
            cur += c
        i += 1
    # exactly one whitespace byte separates the header from raster data,
    # and it was consumed by the loop above
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM bytes → (h, w, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (w, h, maxval), off = _ppm_header_tokens(payload, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24 bpp, BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bpp bottom-up BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    file_header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = np.ascontiguousarray(pixels[:, :, ::-1], dtype=np.uint8)  # RGB→BGR
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return file_header + info_header + rows[::-1].tobytes()  # bottom-up


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP bytes → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    need = stride * h
    raster = payload[data_off : data_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if bottom_up:
        rows = rows[::-1]
    return rows.reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB


# ---------------------------------------------------------------------------
# Shared ops
# ---------------------------------------------------------------------------

#: magic-byte sniffing → decoder
DECODERS = {b"P6": decode_ppm, b"BM": decode_bmp}


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff magic bytes and decode; raises NotImplementedError for media
    this pure-NumPy path cannot handle (PNG/JPEG/… need a real codec lib —
    that is the documented plug point in sources/multimodal.py)."""
    dec = DECODERS.get(bytes(payload[:2]))
    if dec is None:
        raise NotImplementedError(
            f"no pure-NumPy decoder for magic {bytes(payload[:2])!r}; plug in PIL/ffmpeg"
        )
    return dec(payload)


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index mapping (pure NumPy)."""
    h, w, _ = pixels.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]
