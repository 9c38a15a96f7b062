"""Pure-NumPy image codecs: binary PPM (P6), 24-bpp BMP, and 8-bit PNG.

The container ships no PIL/ffmpeg, but these formats are decodable with
``struct`` + stdlib ``zlib`` + NumPy alone — which gives the multimodal
pipeline (sources/multimodal.py) REAL end-to-end decode paths next to the
documented stub seam. Everything here is deterministic and byte-exact, so
decode results are oracle-checkable when the payloads are generated from
known parameters.

Formats (public specs):
- PPM P6: ASCII header ``P6 <w> <h> <maxval>`` with ``#`` comments and
  arbitrary whitespace, then ``w*h*3`` raw RGB bytes (maxval <= 255).
- BMP: BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes),
  24 bpp, uncompressed (BI_RGB), rows stored bottom-up and padded to a
  4-byte boundary, pixels in BGR order.
- PNG (RFC 2083 / W3C spec): 8-byte signature, length-type-data-CRC
  chunks, IHDR + IDAT (zlib-compressed filtered scanlines) + IEND.
  Supported subset: bit depth 8, color type 2 (RGB) / 6 (RGBA),
  non-interlaced — the dominant shape of real-corpus PNGs. All five
  scanline filters (None/Sub/Up/Average/Paeth) are implemented on both
  the encode and decode side, so each unfilter path is round-trippable.
"""

from __future__ import annotations

import struct
import zlib

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
# Shared DIB raster (the BMP/AVI common layer — ONE definition of the
# stride/flip/BGR logic so the two containers cannot drift)
# ---------------------------------------------------------------------------


def _dib_encode(frame: np.ndarray) -> bytes:
    """(h, w, 3) RGB → bottom-up BGR raster with 4-byte row padding (the
    BMP/DIB raster layout, sans file headers)."""
    h, w, _ = frame.shape
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    bgr = np.ascontiguousarray(frame[:, :, ::-1], dtype=np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return rows[::-1].tobytes()


def _dib_decode(raster: bytes, w: int, h: int, bottom_up: bool = True) -> np.ndarray:
    """Padded BGR DIB raster → (h, w, 3) RGB. ``bottom_up=False`` for
    top-down rasters (negative biHeight — rows already in display order)."""
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    if len(raster) != stride * h:
        raise ValueError(f"bad DIB frame size: want {stride * h}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if bottom_up:
        rows = rows[::-1]
    return rows.reshape(h, w, 3)[:, :, ::-1]


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
    return file_header + info_header + _dib_encode(pixels)  # bottom-up BGR


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
    need = ((w * 3 + 3) & ~3) * h
    raster = payload[data_off : data_off + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: want {need}, got {len(raster)}")
    return _dib_decode(raster, w, h, bottom_up=bottom_up)


# ---------------------------------------------------------------------------
# PNG (8-bit RGB/RGBA, non-interlaced)
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    body = ctype + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16 arrays (spec §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3|4) uint8 array → PNG bytes, applying ``filter_type``
    (0=None 1=Sub 2=Up 3=Average 4=Paeth) uniformly to every scanline.

    The filter choice changes the bytes but never the decoded image, which
    is exactly what makes generated PNGs oracle-checkable while still
    exercising every unfilter path in :func:`decode_png`."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) array, got {pixels.shape}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    h, w, bpp = pixels.shape
    color_type = 2 if bpp == 3 else 6
    raw = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * bpp)
    cur = raw.astype(np.int16)
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    up = np.zeros_like(cur)
    up[1:] = cur[:-1]
    ul = np.zeros_like(cur)
    ul[1:, bpp:] = cur[:-1, :-bpp]
    if filter_type == 0:
        filt = cur
    elif filter_type == 1:
        filt = cur - left
    elif filter_type == 2:
        filt = cur - up
    elif filter_type == 3:
        filt = cur - (left + up) // 2
    else:
        filt = cur - _paeth(left, up, ul)
    scanlines = np.empty((h, 1 + w * bpp), dtype=np.uint8)
    scanlines[:, 0] = filter_type
    scanlines[:, 1:] = (filt % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8 array.

    Supports the 8-bit RGB/RGBA non-interlaced subset; grayscale, palette,
    16-bit, and Adam7 raise ValueError (they need wider raster plumbing —
    extend here, not in callers). Unfiltering is NumPy-wide per scanline:
    Up is a whole-row add, Sub is a per-lane prefix sum, Average/Paeth
    walk pixels left-to-right but stay vectorized across channel lanes."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):  # data + CRC must both fit
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if len(ihdr) != 13:
        raise ValueError(f"malformed IHDR chunk ({len(ihdr)} bytes, want 13)")
    w, h, depth, color_type, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in (2, 6):
        raise ValueError(f"only 8-bit RGB/RGBA supported (depth={depth}, color={color_type})")
    if comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError("only deflate/adaptive-filter/non-interlaced PNG supported")
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    try:
        raster = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # CRC-valid chunk with corrupt deflate stream
        raise ValueError(f"bad IDAT deflate stream: {e}") from e
    if len(raster) != h * (1 + stride):
        raise ValueError(f"raster size mismatch: want {h * (1 + stride)}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, 1 + stride)
    filters, data = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f, line = int(filters[y]), data[y].astype(np.int16)
        if f == 0:
            recon = line
        elif f == 1:
            # Sub: recon(x) = filt(x) + recon(x-bpp) → per-lane prefix sum
            recon = np.cumsum(line.reshape(w, bpp).astype(np.int64), axis=0).reshape(stride)
        elif f == 2:
            recon = line + prev
        elif f == 3:
            recon = line.copy()
            recon[:bpp] = (line[:bpp] + prev[:bpp] // 2) % 256
            for x in range(bpp, stride, bpp):
                recon[x : x + bpp] = (
                    line[x : x + bpp]
                    + (recon[x - bpp : x] + prev[x : x + bpp]) // 2
                ) % 256
        elif f == 4:
            recon = line.copy()
            zero = np.zeros(bpp, dtype=np.int16)
            recon[:bpp] = (line[:bpp] + _paeth(zero, prev[:bpp], zero)) % 256
            for x in range(bpp, stride, bpp):
                recon[x : x + bpp] = (
                    line[x : x + bpp]
                    + _paeth(recon[x - bpp : x], prev[x : x + bpp], prev[x - bpp : x])
                ) % 256
        else:
            raise ValueError(f"bad scanline filter {f}")
        prev = (recon % 256).astype(np.int16)
        out[y] = prev.astype(np.uint8)
    return out.reshape(h, w, bpp)


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 array → RIFF/WAVE PCM-16 bytes."""
    if samples.ndim != 2:
        raise ValueError(f"expected (frames, channels) array, got {samples.shape}")
    n_ch = samples.shape[1]
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate,
                      sample_rate * n_ch * 2, n_ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 bytes → ((n_frames, n_channels) int16 array, rate).

    Walks the chunk list (tolerating extra chunks like LIST/INFO); only
    uncompressed 16-bit PCM is supported — compressed codecs (MP3, AAC,
    ADPCM) need a real audio library and raise ValueError here."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8 : pos + 8 + length]
        if len(chunk) != length:  # truncated file must error, not shrink
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt = chunk
        elif ctype == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"malformed fmt chunk ({len(fmt)} bytes, want >= 16)")
    audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
    if n_ch < 1:
        raise ValueError(f"invalid channel count {n_ch}")
    frames = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        frames = frames.reshape(-1, n_ch)
    else:
        frames = frames.reshape(-1, 1)
    return frames, rate


# ---------------------------------------------------------------------------
# AVI (RIFF container, uncompressed 24-bpp DIB frames)
# ---------------------------------------------------------------------------


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 array → uncompressed-DIB AVI bytes (RIFF 'AVI '
    with hdrl/movi lists, one '00db' chunk per frame)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) array, got {frames.shape}")
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    n, h, w, _ = frames.shape
    frame_bytes = ((w * 3 + 3) & ~3) * h

    def chunk(ctype: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return ctype + struct.pack("<I", len(data)) + data + pad

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,  # µs/frame, rate, pad, HASINDEX-less flags
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", _dib_encode(f)) for f in frames))
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) + b"AVI " + hdrl + movi


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed-DIB AVI bytes → ((n, h, w, 3) uint8 array, fps).

    Walks the RIFF list tree for the stream format (dimensions, 24-bpp
    uncompressed check) and the movi frame chunks; compressed codecs
    (MJPEG, H.264, …) raise ValueError — the ffmpeg plug point."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    strf = None
    fps = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal strf, fps
        pos = 0
        while pos + 8 <= len(buf):
            ctype = buf[pos : pos + 4]
            (length,) = struct.unpack_from("<I", buf, pos + 4)
            data = buf[pos + 8 : pos + 8 + length]
            if len(data) != length:
                raise ValueError(f"truncated AVI chunk {ctype!r}")
            if ctype == b"LIST":
                walk(data[4:])  # skip the list-type fourcc
            elif ctype == b"strf" and strf is None:
                # FIRST strf wins: the video strl precedes any audio strl
                # in a conformant AVI, and a later audio strf (WAVEFORMAT)
                # must not override the video format
                strf = data
            elif ctype == b"avih":
                if len(data) < 4:
                    raise ValueError("malformed avih chunk")
                (us_per_frame,) = struct.unpack_from("<I", data, 0)
                if us_per_frame == 0:
                    raise ValueError("invalid frame rate (0 us/frame)")
                fps = round(1_000_000 / us_per_frame)
            elif ctype in (b"00db", b"00dc"):
                frames_raw.append(data)
            pos += 8 + length + (length & 1)

    walk(payload[12:])
    if strf is None or not frames_raw:
        raise ValueError("missing strf/movi frames")
    if fps is None:
        raise ValueError("missing avih chunk")
    if len(strf) < 40:
        raise ValueError(f"malformed strf chunk ({len(strf)} bytes)")
    _, w, h, _, bpp, compression = struct.unpack_from("<IiiHHI", strf, 0)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bpp DIB frames supported (bpp={bpp}, comp={compression})"
        )
    # negative biHeight = top-down rows (standard for capture tools)
    decoded = np.stack(
        [_dib_decode(f, w, abs(h), bottom_up=h > 0) for f in frames_raw]
    )
    return decoded, fps


# ---------------------------------------------------------------------------
# Shared ops
# ---------------------------------------------------------------------------

#: magic-byte sniffing → decoder
DECODERS = {b"P6": decode_ppm, b"BM": decode_bmp, PNG_SIG[:2]: decode_png}


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
