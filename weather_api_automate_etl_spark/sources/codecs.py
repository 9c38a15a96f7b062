"""Pure-NumPy media codecs: PPM (P6), 24-bpp BMP, 8-bit PNG, baseline
JFIF JPEG, RIFF/PCM-16 WAV, and uncompressed-DIB AVI.

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
  Supported subset: bit depth 8, color type 2 (RGB) / 6 (RGBA), both
  non-interlaced and Adam7 interlaced (spec §8.2: seven independently
  filtered reduced passes, empty passes omitted). All five scanline
  filters (None/Sub/Up/Average/Paeth) are implemented on both the
  encode and decode side, so each unfilter path is round-trippable.
- JPEG (ITU T.81 baseline + JFIF): marker segments, file-supplied
  quant/Huffman tables, interleaved Huffman-coded MCUs — see the JPEG
  section below for the exact supported subset.
- WAV (RIFF/WAVE): chunk walk, uncompressed PCM-16 only.
- AVI (RIFF 'AVI '): hdrl/strl/movi walk, uncompressed 24-bpp DIB
  frames only; strf is bound to the 'vids' strh within its strl.
- GIF (GIF87a/89a): logical screen descriptor, global/local color
  tables, extension-block skip, variable-width LSB-first LZW with
  CLEAR/EOI handling, width growth to 12 bits, table-full clears, and
  4-pass de-interlace. Decode returns the FIRST frame as RGB; encode
  writes a single-frame GIF89a from an explicit (indices, palette) pair.
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
    if len(payload) < 54:  # 14-byte file header + 40-byte info header
        raise ValueError("truncated BMP header")
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


#: Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step).
#: Pass k holds the pixels at (y_start + i·y_step, x_start + j·x_step);
#: passes whose grid misses a small image entirely are simply absent
#: from the stream (spec: "empty passes are omitted").
ADAM7_PASSES = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_raster(raw: np.ndarray, bpp: int, filter_type: int) -> np.ndarray:
    """Apply one PNG scanline filter uniformly to an (h, stride) uint8
    raster; returns (h, 1+stride) scanlines with the filter byte."""
    h, stride = raw.shape
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
    scanlines = np.empty((h, 1 + stride), dtype=np.uint8)
    scanlines[:, 0] = filter_type
    scanlines[:, 1:] = (filt % 256).astype(np.uint8)
    return scanlines


def encode_png(
    pixels: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """(h, w, 3|4) uint8 array → PNG bytes, applying ``filter_type``
    (0=None 1=Sub 2=Up 3=Average 4=Paeth) uniformly to every scanline.

    The filter choice changes the bytes but never the decoded image, which
    is exactly what makes generated PNGs oracle-checkable while still
    exercising every unfilter path in :func:`decode_png`.

    ``interlace=True`` writes Adam7 (spec §8.2): the image is serialized
    as up to seven reduced sub-images, each filtered INDEPENDENTLY (the
    filter's left/up neighbors are within the pass raster, and each pass
    restarts with a zero prior row) — the property a correct decoder must
    honor and a naive sequential unfilter gets wrong."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError(f"expected (h, w, 3|4) array, got {pixels.shape}")
    if filter_type not in range(5):
        raise ValueError(f"bad filter type {filter_type}")
    h, w, bpp = pixels.shape
    color_type = 2 if bpp == 3 else 6
    raw = np.ascontiguousarray(pixels, dtype=np.uint8)
    if interlace:
        parts = []
        for x0, y0, dx, dy in ADAM7_PASSES:
            sub = raw[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass: omitted from the stream
            parts.append(
                _filter_raster(
                    sub.reshape(sub.shape[0], sub.shape[1] * bpp),
                    bpp,
                    filter_type,
                ).tobytes()
            )
        stream = b"".join(parts)
    else:
        stream = _filter_raster(
            raw.reshape(h, w * bpp), bpp, filter_type
        ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(stream, 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_raster(rows: np.ndarray, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering over an (h, 1+w·bpp) byte matrix
    (filter byte + filtered scanline per row) → (h, w·bpp) uint8 raster.
    NumPy-wide per scanline: Up is a whole-row add, Sub is a per-lane
    prefix sum, Average/Paeth walk pixels left-to-right but stay
    vectorized across channel lanes. One call per image — or per Adam7
    pass, whose filters are independent by spec (prior row resets)."""
    h, stride = rows.shape[0], w * bpp
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
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3|4) uint8 array.

    Supports the 8-bit RGB/RGBA subset, BOTH non-interlaced and Adam7
    interlaced (spec §8.2: seven reduced passes, each unfiltered
    independently, scattered back on the pass grid; empty passes are
    omitted from the stream). Grayscale, palette, and 16-bit raise
    ValueError (they need wider raster plumbing — extend here, not in
    callers)."""
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
    if comp != 0 or filt_method != 0 or interlace not in (0, 1):
        raise ValueError("only deflate/adaptive-filter PNG supported")
    bpp = 3 if color_type == 2 else 4
    stride = w * bpp
    try:
        raster = zlib.decompress(b"".join(idat))
    except zlib.error as e:  # CRC-valid chunk with corrupt deflate stream
        raise ValueError(f"bad IDAT deflate stream: {e}") from e
    if interlace == 1:
        out = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in ADAM7_PASSES:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty pass carries no scanlines at all
            nbytes = ph * (1 + pw * bpp)
            if pos + nbytes > len(raster):
                raise ValueError("truncated Adam7 pass data")
            rows = np.frombuffer(
                raster, dtype=np.uint8, count=nbytes, offset=pos
            ).reshape(ph, 1 + pw * bpp)
            pos += nbytes
            sub = _unfilter_raster(rows, pw, bpp).reshape(ph, pw, bpp)
            out[y0::dy, x0::dx] = sub
        if pos != len(raster):
            raise ValueError(f"trailing bytes after Adam7 passes: {len(raster) - pos}")
        return out
    if len(raster) != h * (1 + stride):
        raise ValueError(f"raster size mismatch: want {h * (1 + stride)}, got {len(raster)}")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, 1 + stride)
    return _unfilter_raster(rows, w, bpp).reshape(h, w, bpp)


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
    if rate <= 0:
        raise ValueError(f"invalid sample rate {rate}")
    if len(data) % (n_ch * 2) != 0:
        # fail loudly (the decoder contract) instead of surfacing a raw
        # numpy reshape error for a non-frame-aligned data chunk
        raise ValueError(
            f"data chunk ({len(data)} bytes) is not a whole number of "
            f"{n_ch}-channel 16-bit frames"
        )
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

    def chunks(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            ctype = buf[pos : pos + 4]
            (length,) = struct.unpack_from("<I", buf, pos + 4)
            data = buf[pos + 8 : pos + 8 + length]
            if len(data) != length:
                raise ValueError(f"truncated AVI chunk {ctype!r}")
            yield ctype, data
            pos += 8 + length + (length & 1)

    def walk(buf: bytes) -> None:
        nonlocal strf, fps
        for ctype, data in chunks(buf):
            if ctype == b"LIST":
                ltype, body = data[:4], data[4:]
                if ltype == b"strl":
                    # bind strf to the 'vids' strh WITHIN its own strl —
                    # stream order is not guaranteed (an audio strl may
                    # legally precede the video strl), so "first strf
                    # wins" would misparse such files
                    in_vids = False
                    for sub_t, sub_d in chunks(body):
                        if sub_t == b"strh":
                            in_vids = sub_d[:4] == b"vids"
                        elif sub_t == b"strf" and in_vids and strf is None:
                            strf = sub_d
                else:
                    walk(body)
            elif ctype == b"avih" and fps is None:  # first avih is canonical
                if len(data) < 4:
                    raise ValueError("malformed avih chunk")
                (us_per_frame,) = struct.unpack_from("<I", data, 0)
                if us_per_frame == 0:
                    raise ValueError("invalid frame rate (0 us/frame)")
                fps = round(1_000_000 / us_per_frame)
            elif ctype in (b"00db", b"00dc"):
                frames_raw.append(data)

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
# JPEG (JFIF: SOF0 baseline + SOF2 progressive, Huffman entropy coding)
# ---------------------------------------------------------------------------
#
# Pure NumPy + struct — no libjpeg/PIL. Supported subset, chosen to cover
# real baseline AND progressive files while staying auditable:
#   decode: SOF0 and SOF2 (full Annex G: spectral selection and
#           successive approximation — DC/AC first + refinement scans,
#           EOB runs), 3-component YCbCr with 1x1 sampling (no chroma
#           subsampling), 8-bit DQT tables, any DHT tables (read from the
#           file, as the spec requires — never assumed), restart markers
#           (sequential scans), byte stuffing. 12-bit, subsampled,
#           arithmetic-coded, or DRI-inside-progressive files raise
#           ValueError — the libjpeg plug point.
#   encode: the matching shape (4:4:4, quality-scaled Annex-K quant
#           tables, uniform-length Huffman tables written into DHT — any
#           conformant decoder reads tables from DHT, so fixed-length
#           codes are valid JPEG, just less compressed). encode_jpeg
#           writes one baseline scan; encode_jpeg_progressive writes the
#           libjpeg-style _PROG_SCRIPT over the IDENTICAL quantized
#           coefficients, so the two streams decode bit-identically.
#
# Rounding discipline: quantization and final pixel conversion use
# floor(x + 0.5) (half-up, sign-deterministic) — never np.round (banker's)
# — so encode/decode results are platform-reproducible.

#: Annex-K base quantization tables (quality 50), row-major 8x8
_JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def _zigzag_order() -> list[int]:
    """Flat indices of the 8x8 grid in JPEG zigzag scan order."""
    out = []
    for s in range(15):
        coords = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            coords.reverse()  # even diagonals run bottom-left -> top-right
        out.extend(r * 8 + c for r, c in coords)
    return out


_ZIGZAG = np.array(_zigzag_order())
_UNZIGZAG = np.argsort(_ZIGZAG)

#: orthonormal 8-point DCT-II matrix (rows = frequencies)
_DCT_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

#: uniform-length Huffman spec: all 12 DC size categories as 4-bit codes,
#: all AC run/size symbols as 8-bit codes — the 162 baseline symbols
#: plus the 14 progressive EOBn codes (r<<4 for r=1..14, T.81 G.1.2.2;
#: harmless in baseline streams, which never emit them). Written into
#: DHT verbatim; valid canonical tables (12 <= 2^4, 176 <= 2^8).
_DC_HUFF_BITS = tuple(12 if ln == 4 else 0 for ln in range(1, 17))
_DC_HUFF_VALS = tuple(range(12))
_AC_HUFF_BITS = tuple(176 if ln == 8 else 0 for ln in range(1, 17))
_AC_HUFF_VALS = (
    (0x00, 0xF0)
    + tuple((r << 4) | s for r in range(16) for s in range(1, 11))
    + tuple(r << 4 for r in range(1, 15))
)


def _huff_encode_table(bits, vals) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol -> (code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling, integer arithmetic, clipped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _entropy_encode_block(
    bw: _BitWriter, zz: np.ndarray, prev_dc: int, dc_tab, ac_tab
) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    diff = dc - prev_dc
    size = abs(diff).bit_length()
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        if size > 10:
            raise ValueError(
                f"AC coefficient {v} exceeds baseline size 10; lower quality"
            )
        c, ln = ac_tab[(run << 4) | size]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        c, ln = ac_tab[0x00]  # EOB
        bw.write(c, ln)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ],
        axis=-1,
    )


def _jpeg_quantized_coeffs(
    pixels: np.ndarray, quality: int
) -> tuple[np.ndarray, list[np.ndarray], int, int]:
    """Shared encoder front half: RGB → per-component quantized zigzag
    coefficient blocks. Returns ``(coeffs[3, n_blocks, 64], qt, h, w)``
    with blocks in raster order — the baseline and progressive encoders
    differ only in how these exact integers are entropy-coded, which is
    what makes the progressive-equals-baseline decode contract exact."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = [
        _scaled_quant(_JPEG_QUANT_LUMA, quality),
        _scaled_quant(_JPEG_QUANT_CHROMA, quality),
    ]
    # pad to 8-multiples by edge replication, component planes
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    ycc = _rgb_to_ycbcr(pixels)
    ycc = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    n_blocks = (ph // 8) * (pw // 8)
    coeffs = np.empty((3, n_blocks, 64), dtype=np.int64)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for comp in range(3):
                block = ycc[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, comp]
                coeff = _DCT_T @ (block - 128.0) @ _DCT_T.T
                q = qt[0 if comp == 0 else 1].reshape(8, 8)
                coeffs[comp, by * (pw // 8) + bx] = (
                    np.floor(coeff / q + 0.5).astype(np.int64).ravel()[_ZIGZAG]
                )
    return coeffs, qt, h, w


def _jpeg_seg(marker: int, data: bytes) -> bytes:
    return struct.pack(">HH", marker, len(data) + 2) + data


def _jpeg_headers(qt, h: int, w: int, sof_marker: int) -> bytes:
    """SOI..DHT common header run; ``sof_marker`` picks SOF0/SOF2."""
    app0 = _jpeg_seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    dqt = b"".join(
        _jpeg_seg(
            0xFFDB, bytes([tq]) + bytes(qt[tq].ravel()[_ZIGZAG].astype(np.uint8))
        )
        for tq in (0, 1)
    )
    sof = _jpeg_seg(
        sof_marker,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"".join(struct.pack(">BBB", cid, 0x11, 0 if cid == 1 else 1)
                   for cid in (1, 2, 3)),
    )
    dht = _jpeg_seg(
        0xFFC4,
        bytes([0x00]) + bytes(_DC_HUFF_BITS) + bytes(_DC_HUFF_VALS)
        + bytes([0x10]) + bytes(_AC_HUFF_BITS) + bytes(_AC_HUFF_VALS),
    )
    return b"\xff\xd8" + app0 + dqt + sof + dht


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, SOF0)."""
    coeffs, qt, h, w = _jpeg_quantized_coeffs(pixels, quality)
    dc_tab = _huff_encode_table(_DC_HUFF_BITS, _DC_HUFF_VALS)
    ac_tab = _huff_encode_table(_AC_HUFF_BITS, _AC_HUFF_VALS)
    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for m in range(coeffs.shape[1]):  # MCU = one block per component (1x1)
        for comp in range(3):
            prev_dc[comp] = _entropy_encode_block(
                bw, coeffs[comp, m], prev_dc[comp], dc_tab, ac_tab
            )
    bw.flush()
    sos = _jpeg_seg(
        0xFFDA,
        bytes([3]) + b"".join(struct.pack(">BB", cid, 0x00) for cid in (1, 2, 3))
        + bytes([0, 63, 0]),
    )
    return _jpeg_headers(qt, h, w, 0xFFC0) + sos + bytes(bw.buf) + b"\xff\xd9"


#: The progressive scan script (T.81 Annex G, libjpeg-style): spectral
#: selection AND successive approximation. (comps, Ss, Se, Ah, Al) —
#: DC first at Al=1 interleaved, per-component AC first scans at Al=2
#: (luma split into two spectral bands to exercise band boundaries),
#: DC refinement, then two AC refinement rounds down to full precision.
_PROG_SCRIPT: tuple[tuple[tuple[int, ...], int, int, int, int], ...] = (
    ((0, 1, 2), 0, 0, 0, 1),   # DC first, point-transformed
    ((0,), 1, 5, 0, 2),        # AC first, luma low band
    ((0,), 6, 63, 0, 2),       # AC first, luma high band
    ((1,), 1, 63, 0, 2),       # AC first, Cb
    ((2,), 1, 63, 0, 2),       # AC first, Cr
    ((0, 1, 2), 0, 0, 1, 0),   # DC refinement (raw bits)
    ((0,), 1, 63, 2, 1),       # AC refinement round 1
    ((1,), 1, 63, 2, 1),
    ((2,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),       # AC refinement round 2 (full precision)
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
)


def _flush_eobrun(bw, ac_tab, state) -> None:
    """Emit the pending EOBn code + extension bits and any buffered
    correction bits (refinement scans) — shared by both progressive AC
    scan encoders (G.1.2.2 / G.1.2.3)."""
    if state["eobrun"] > 0:
        r = state["eobrun"].bit_length() - 1
        c, ln = ac_tab[r << 4]
        bw.write(c, ln)
        bw.write(state["eobrun"] - (1 << r), r)
        state["eobrun"] = 0
    for bit in state["br"]:
        bw.write(bit, 1)
    state["br"] = []


def _enc_ac_first(bw, blocks, Ss, Se, Al, ac_tab, state) -> None:
    """Progressive AC first scan (G.1.2.2) for one component's blocks:
    band run-size coding on the point-transformed magnitudes with
    EOB-run accumulation across blocks (EOBn codes)."""

    def flush_eob():
        _flush_eobrun(bw, ac_tab, state)

    for blk in blocks:
        run = 0
        for k in range(Ss, Se + 1):
            v = int(blk[k])
            t = (abs(v) >> Al)  # AC point transform truncates toward 0
            if t == 0:
                run += 1
                continue
            flush_eob()
            while run >= 16:
                c, ln = ac_tab[0xF0]
                bw.write(c, ln)
                run -= 16
            size = t.bit_length()
            if size > 10:
                raise ValueError(f"AC coefficient {v} exceeds size 10")
            c, ln = ac_tab[(run << 4) | size]
            bw.write(c, ln)
            # negative magnitudes code as value-1 in size bits (F.1.2.2):
            # the signed point-transformed value is -t, so -t + 2^size - 1
            bw.write(t if v > 0 else (1 << size) - 1 - t, size)
            run = 0
        if run:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(bw, blocks, Ss, Se, Al, ac_tab, state) -> None:
    """Progressive AC refinement scan (G.1.2.3, the libjpeg
    encode_mcu_AC_refine shape): newly-significant coefficients emit
    run-size 1 codes, history coefficients append correction bits, and
    all-insignificant tails fold into EOB runs carrying their pending
    correction bits."""

    def flush_eob():
        _flush_eobrun(bw, ac_tab, state)

    for blk in blocks:
        absv = [abs(int(blk[k])) >> Al for k in range(Ss, Se + 1)]
        eob = 0  # index AFTER the last newly-significant coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i + 1
        run, br = 0, []
        for i, t in enumerate(absv):
            if t == 0:
                run += 1
                continue
            # pending ZRLs flush HERE — before a history bit buffers, not
            # deferred to the next significant coefficient: the decoder's
            # skip walk consumes correction bits positionally, so the
            # libjpeg emission order is the only one that round-trips
            while run > 15 and i < eob:
                flush_eob()
                c, ln = ac_tab[0xF0]
                bw.write(c, ln)
                run -= 16
                for bit in br:
                    bw.write(bit, 1)
                br = []
            if t > 1:  # history coefficient: correction bit, run unbroken
                br.append(t & 1)
                continue
            # newly significant (t == 1)
            flush_eob()
            c, ln = ac_tab[(run << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if int(blk[Ss + i]) > 0 else 0, 1)
            for bit in br:
                bw.write(bit, 1)
            run, br = 0, []
        if run > 0 or br:
            state["eobrun"] += 1
            state["br"].extend(br)
            if state["eobrun"] == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB → progressive JFIF bytes (4:4:4, SOF2,
    ``_PROG_SCRIPT``). Entropy-codes the IDENTICAL quantized
    coefficients as ``encode_jpeg``, so decoding either stream yields
    bit-identical pixels — the exact contract the progressive query
    hashes."""
    coeffs, qt, h, w = _jpeg_quantized_coeffs(pixels, quality)
    dc_tab = _huff_encode_table(_DC_HUFF_BITS, _DC_HUFF_VALS)
    ac_tab = _huff_encode_table(_AC_HUFF_BITS, _AC_HUFF_VALS)
    out = bytearray(_jpeg_headers(qt, h, w, 0xFFC2))
    n_blocks = coeffs.shape[1]
    for comps, Ss, Se, Ah, Al in _PROG_SCRIPT:
        sos = _jpeg_seg(
            0xFFDA,
            bytes([len(comps)])
            + b"".join(struct.pack(">BB", c + 1, 0x00) for c in comps)
            + bytes([Ss, Se, (Ah << 4) | Al]),
        )
        out += sos
        bw = _BitWriter()
        if Ss == 0:  # DC scan, interleaved over all listed components
            if Ah == 0:
                pred = [0] * len(comps)
                for m in range(n_blocks):
                    for j, comp in enumerate(comps):
                        dc = int(coeffs[comp, m, 0]) >> Al  # arithmetic
                        diff = dc - pred[j]
                        pred[j] = dc
                        size = abs(diff).bit_length()
                        c, ln = dc_tab[size]
                        bw.write(c, ln)
                        if size:
                            bw.write(
                                diff if diff > 0 else diff + (1 << size) - 1,
                                size,
                            )
            else:  # DC refinement: one raw bit per block per component
                for m in range(n_blocks):
                    for comp in comps:
                        bw.write((int(coeffs[comp, m, 0]) >> Al) & 1, 1)
        else:  # AC scan: exactly one component (T.81 G.1.1)
            state = {"eobrun": 0, "br": []}
            enc = _enc_ac_first if Ah == 0 else _enc_ac_refine
            enc(bw, coeffs[comps[0]], Ss, Se, Al, ac_tab, state)
        bw.flush()
        out += bw.buf
    return bytes(out) + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, payload: bytes, pos: int) -> None:
        self.payload = payload
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        p = self.payload
        if self.pos >= len(p):
            raise ValueError("truncated JPEG entropy segment")
        byte = p[self.pos]
        if byte == 0xFF:
            nxt = p[self.pos + 1] if self.pos + 1 < len(p) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed
            else:
                # marker reached: spec says pad with 1-bits (decoder that
                # reads past the scan is a bug upstream; fail loudly)
                raise ValueError("hit marker inside entropy decode")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self) -> bool:
        return (
            self.pos + 1 < len(self.payload)
            and self.payload[self.pos] == 0xFF
            and self.payload[self.pos + 1] != 0x00
        )


def _huff_decode_table(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical assignment (F.2.2.3)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _dec_scan_baseline(br, coeffs, scan_tabs, n_mcus, restart_interval, payload):
    """Baseline sequential scan: full-precision blocks, interleaved."""
    pred = [0, 0, 0]
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            br.align()
            if not br.at_marker():
                raise ValueError("expected restart marker")
            rst = payload[br.pos + 1]
            if not 0xD0 <= rst <= 0xD7:
                raise ValueError(f"expected RSTn, got {rst:#x}")
            br.pos += 2
            pred = [0, 0, 0]
        for comp in range(3):
            dc_tab, ac_tab = scan_tabs[comp]
            size = _huff_decode(br, dc_tab)
            if size > 11:
                raise ValueError(f"bad DC size {size}")
            diff = _extend(br.receive(size), size) if size else 0
            pred[comp] += diff
            blk = coeffs[comp, m]
            blk[0] = pred[comp]
            k = 1
            while k < 64:
                rs = _huff_decode(br, ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                blk[k] = _extend(br.receive(size), size)
                k += 1


def _dec_scan_prog_dc(br, coeffs, comp_idx, dc_tabs, n_mcus, ah, al):
    """Progressive DC scan, interleaved (T.81 G.1.2.1): first pass is
    baseline DC prediction on the point-transformed values; refinement
    is one raw bit per block OR-ed in at bit ``al``."""
    if ah == 0:
        pred = [0] * len(comp_idx)
        for m in range(n_mcus):
            for j, comp in enumerate(comp_idx):
                size = _huff_decode(br, dc_tabs[j])
                if size > 11:
                    raise ValueError(f"bad DC size {size}")
                diff = _extend(br.receive(size), size) if size else 0
                pred[j] += diff
                coeffs[comp, m, 0] = pred[j] << al
    else:
        for m in range(n_mcus):
            for comp in comp_idx:
                if br.read_bit():
                    # low bits of the partial value are zero, so OR = add
                    coeffs[comp, m, 0] = int(coeffs[comp, m, 0]) | (1 << al)


def _dec_scan_prog_ac_first(br, blocks, ss, se, al, ac_tab, n_mcus):
    """Progressive AC first scan (G.1.2.2), single component: band
    run-size decode with EOB-run skipping, values scaled by 2^al."""
    eobrun = 0
    for m in range(n_mcus):
        if eobrun > 0:
            eobrun -= 1
            continue
        blk = blocks[m]
        k = ss
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) + (br.receive(r) if r else 0) - 1
                break
            k += r
            if k > se:
                raise ValueError("AC run past spectral band")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1


def _dec_scan_prog_ac_refine(br, blocks, ss, se, al, ac_tab, n_mcus):
    """Progressive AC refinement scan (G.1.2.3, the libjpeg
    decode_mcu_AC_refine walk): newly-significant coefficients arrive as
    run-size 1 codes, every nonzero-history coefficient passed on the
    way consumes one correction bit, EOB runs sweep correction bits
    through the rest of the band."""
    p1, m1 = 1 << al, -1 << al
    eobrun = 0

    def correct(blk, k):
        c = int(blk[k])
        if br.read_bit() and (c & p1) == 0:
            blk[k] = c + (p1 if c >= 0 else m1)

    for m in range(n_mcus):
        blk = blocks[m]
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _huff_decode(br, ac_tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + (br.receive(r) if r else 0)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if int(blk[k]) != 0:
                        correct(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if int(blk[k]) != 0:
                    correct(blk, k)
                k += 1
            eobrun -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JFIF bytes → (h, w, 3)
    uint8 RGB.

    Tables (DQT/DHT) are read from the file as the spec requires, so
    files from any conformant encoder decode — not just ours.
    Progressive streams take the full Annex-G multi-scan path: spectral
    selection AND successive approximation (DC+AC first and refinement
    scans, EOB runs). Outside the supported subset (3-component 1x1
    8-bit; no DRI inside progressive scans) raises ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    coeffs = None
    saw_scan = False
    while True:
        if pos + 2 > len(payload):
            if saw_scan:
                break  # missing EOI: decode what arrived (truncated
                # foreign files are common; progressive is incremental)
            raise ValueError("truncated JPEG (no EOI)")
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("EOI before scan data")
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        def _need(n: int, what: str) -> None:
            # a corrupt seg_len passes the outer check with a too-short
            # segment: fixed-layout reads must ValueError, not struct.error
            if len(seg) < n:
                raise ValueError(f"truncated JPEG {what}")

        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(seg[sp + 1 : sp + 65], dtype=np.uint8)
                if len(tab) != 64:
                    raise ValueError("short DQT table")
                qtabs[tq] = tab.astype(np.int64)[_UNZIGZAG]
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("short DHT table")
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                sp += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _need(6, "SOF header")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            _need(6 + 3 * nc, "SOF components")
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            if nc != 3:
                raise ValueError(f"{nc}-component JPEG unsupported (YCbCr only)")
            comps = []
            for c in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (fh, fw, comps)
            n_mcus = (-(-fw // 8)) * (-(-fh // 8))
            coeffs = np.zeros((3, n_mcus, 64), dtype=np.int64)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only SOF0/SOF2 JPEG supported")
        elif marker == 0xDD:  # DRI
            _need(2, "DRI segment")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            _need(1, "SOS header")
            ns = seg[0]
            _need(4 + 2 * ns, "SOS header")
            cid_index = {cid: i for i, (cid, _) in enumerate(frame[2])}
            comp_idx, tdtas = [], []
            for c in range(ns):
                cid, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                if cid not in cid_index:
                    raise ValueError(f"scan references unknown component {cid}")
                comp_idx.append(cid_index[cid])
                tdtas.append(tdta)
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not (ss <= se <= 63):
                raise ValueError(f"bad spectral band Ss={ss} Se={se}")
            pos = pos + 2 + seg_len
            br = _BitReader(payload, pos)
            if not progressive:
                if ns != 3:
                    raise ValueError("baseline scan must cover all 3 components")
                scan_tabs = []
                for tdta in tdtas:
                    dc = htabs.get((0, tdta >> 4))
                    ac = htabs.get((1, tdta & 0xF))
                    if dc is None or ac is None:
                        raise ValueError("scan references missing DHT table")
                    scan_tabs.append((dc, ac))
                _dec_scan_baseline(
                    br, coeffs, scan_tabs, coeffs.shape[1],
                    restart_interval, payload,
                )
            else:
                if restart_interval:
                    raise ValueError("DRI inside progressive unsupported")
                if ss == 0:  # DC scan (se must be 0 per G.1.1)
                    if se != 0:
                        raise ValueError("progressive DC scan needs Se=0")
                    dc_tabs = None
                    if ah == 0:
                        dc_tabs = [htabs.get((0, t >> 4)) for t in tdtas]
                        if any(t is None for t in dc_tabs):
                            raise ValueError("scan references missing DHT table")
                    _dec_scan_prog_dc(
                        br, coeffs, comp_idx, dc_tabs, coeffs.shape[1], ah, al
                    )
                else:  # AC scan: exactly one component
                    if ns != 1:
                        raise ValueError("progressive AC scan must be 1-component")
                    ac_tab = htabs.get((1, tdtas[0] & 0xF))
                    if ac_tab is None:
                        raise ValueError("scan references missing DHT table")
                    dec = (
                        _dec_scan_prog_ac_first
                        if ah == 0
                        else _dec_scan_prog_ac_refine
                    )
                    dec(br, coeffs[comp_idx[0]], ss, se, al, ac_tab,
                        coeffs.shape[1])
            saw_scan = True
            # resynchronize: advance to the next true marker (skip
            # stuffed 0xFF00 and any stray RSTn)
            p = br.pos
            while p + 1 < len(payload):
                if payload[p] == 0xFF and payload[p + 1] != 0x00:
                    if 0xD0 <= payload[p + 1] <= 0xD7:
                        p += 2
                        continue
                    break
                p += 1
            pos = p
            continue
        pos = pos + 2 + seg_len

    fh, fw, comps = frame
    for _, tq in comps:
        if tq not in qtabs:
            raise ValueError("frame references missing DQT table")
    bw_, bh_ = -(-fw // 8), -(-fh // 8)
    # dequantize, de-zigzag, batched IDCT per component
    planes = []
    for comp in range(3):
        q = qtabs[comps[comp][1]]
        dq = (coeffs[comp] * q[_ZIGZAG][None, :])[:, _UNZIGZAG].reshape(-1, 8, 8)
        blocks = np.einsum("ij,njk,kl->nil", _DCT_T.T, dq.astype(np.float64), _DCT_T)
        plane = (
            blocks.reshape(bh_, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_ * 8, bw_ * 8)
        ) + 128.0
        planes.append(plane[:fh, :fw])
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# GIF (GIF87a / GIF89a) — variable-width LZW
# ---------------------------------------------------------------------------
#
# LZW width discipline (derived from the stream invariant, test-pinned by
# the round-trip fuzz in tests/test_multimodal.py): the decoder's string
# table runs one entry BEHIND the encoder's at the same stream position
# (the decoder adds its entry only after reading the NEXT code), so
#   decoder: after adding an entry, bump width when size == 1 << width
#   encoder: after adding an entry, bump width when size == (1 << width) + 1
# and the encoder emits CLEAR when its table hits 4096 (the decoder's
# then-4095-entry table never fills, but a deferred-clear guard is kept
# for foreign streams). Bit packing is LSB-first per the spec.


class _LsbBitWriter:
    """LSB-first bit packer (GIF LZW bit order — the JPEG writer above is
    MSB-first, so the two are intentionally separate)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _gif_lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _LsbBitWriter()
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    size = eoi + 1
    bw.write(clear, width)
    seq = [int(v) for v in indices.ravel()]
    prev = seq[0]
    for k in seq[1:]:
        if (prev, k) in table:
            prev = table[(prev, k)]
            continue
        bw.write(prev, width)
        table[(prev, k)] = size
        size += 1
        if size == (1 << width) + 1 and width < 12:
            width += 1
        if size == 4096:
            bw.write(clear, width)
            table.clear()
            size = eoi + 1
            width = min_code_size + 1
        prev = k
    bw.write(prev, width)
    bw.write(eoi, width)
    return bw.flush()


def _gif_lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table = roots + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: int | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = roots + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            # first code after SOI/clear must already be in the table (a
            # root); a corrupt stream can put any 12-bit value here, which
            # must surface as the codec's documented ValueError, not an
            # IndexError (round-6 advice)
            if code >= len(table):
                raise ValueError(f"GIF: LZW code {code} out of range")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"GIF: LZW code {code} out of range")
            out += entry
            if len(table) < 4096:  # deferred-clear guard
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        prev = code
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(indices: np.ndarray, palette: list[tuple[int, int, int]]) -> bytes:
    """Single-frame GIF89a from an explicit (H, W) index raster and its
    palette (≤256 RGB triples). The palette is written as the global color
    table padded to a power of two; indices compress with real
    variable-width LZW."""
    if indices.ndim != 2:
        raise ValueError("encode_gif expects an (H, W) index raster")
    if indices.size == 0:
        # (0, W)/(H, 0) rasters have no first pixel for the LZW seed and
        # no legal GIF representation — reject up front (round-6 advice)
        raise ValueError("encode_gif: empty index raster")
    if not 0 < len(palette) <= 256:
        raise ValueError("GIF palette must have 1..256 entries")
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("index raster references colors beyond the palette")
    h, w = indices.shape
    depth = 1
    while (1 << depth) < len(palette):
        depth += 1
    gct = bytearray()
    for i in range(1 << depth):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += gct
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    mcs = max(2, depth)
    out.append(mcs)
    data = _gif_lzw_compress(indices.astype(np.uint8), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to an (H, W, 3) RGB array.
    Handles global and local color tables, extension blocks, table-full
    streams, and interlaced rasters; transparency is ignored (the palette
    color shows through) — animation composition is out of scope."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF: truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        if pos + n > len(payload):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(payload[pos : pos + n], dtype=np.uint8).reshape(-1, 3)
        pos += n
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer before any image
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 1
            # bounds-checked skip: a truncated extension must surface as
            # the codec's documented ValueError, never IndexError
            # (round-6 advice class; found by the round-12 mutation fuzz)
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension block")
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF: truncated image descriptor")
        _x, _y, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            if pos + n > len(payload):
                raise ValueError("GIF: truncated local color table")
            ct = np.frombuffer(payload[pos : pos + n], dtype=np.uint8).reshape(-1, 3)
            pos += n
        if ct is None:
            raise ValueError("GIF: no color table in scope")
        if pos >= len(payload):
            raise ValueError("GIF: truncated before LZW code size")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("GIF: truncated data sub-blocks")
            ln = payload[pos]
            if not ln:
                break
            if pos + 1 + ln > len(payload):
                raise ValueError("GIF: truncated data sub-blocks")
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decompress(bytes(data), mcs, w * h).reshape(h, w)
        if idx.size and int(idx.max()) >= len(ct):
            # a legal LZW root (< 2^mcs) can still exceed a smaller color
            # table — surface the contract ValueError, not an IndexError
            raise ValueError("GIF: pixel index beyond the color table")
        if ipacked & 0x40:  # 4-pass interlace
            deinter = np.empty_like(idx)
            rows = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            deinter[rows] = idx
            idx = deinter
        return ct[idx]
    raise ValueError("GIF: no image descriptor found")


# ---------------------------------------------------------------------------
# TIFF (baseline 6.0: both byte orders, strips, none/PackBits compression)
# ---------------------------------------------------------------------------


def _packbits_compress(row: bytes) -> bytes:
    """Apple PackBits (TIFF spec §9) over one row: replicate runs of ≥3
    become (257-n, byte); everything else rides literal runs ≤128."""
    out = bytearray()
    i, n = 0, len(row)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(row[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(row[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    return bytes(out)


def _packbits_decompress(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("TIFF: PackBits stream truncated")
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            if pos + h + 1 > len(data):
                raise ValueError("TIFF: PackBits stream truncated")
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # replicate next byte 257-h times
            if pos >= len(data):
                raise ValueError("TIFF: PackBits stream truncated")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op per spec
    if len(out) != expected:
        raise ValueError("TIFF: PackBits output overruns the strip size")
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Baseline TIFF 6.0 from an (H, W, 3) uint8 RGB raster: one IFD,
    8-bit chunky RGB, strip layout (``rows_per_strip`` rows per strip,
    default single-strip), Compression 1 (none) or 32773 (PackBits, each
    row compressed independently per spec §9), and either byte order —
    so every structural degree of freedom the decoder handles exists in
    encoder output too."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_tiff expects an (H, W, 3) raster")
    if pixels.dtype != np.uint8:
        raise ValueError("encode_tiff expects uint8 samples")
    h, w, _ = pixels.shape
    if h == 0 or w == 0:
        raise ValueError("encode_tiff: empty raster")
    bo = ">" if big_endian else "<"
    rps = h if rows_per_strip is None else max(1, min(rows_per_strip, h))
    strips = []
    for y0 in range(0, h, rps):
        raw_rows = pixels[y0 : y0 + rps]
        if packbits:
            strips.append(
                b"".join(_packbits_compress(r.tobytes()) for r in raw_rows)
            )
        else:
            strips.append(raw_rows.tobytes())
    n_strips = len(strips)
    # layout: header(8) | IFD | bits[6] | offsets[4n] | counts[4n] | data
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    bits_off = 8 + ifd_size
    # single-strip offsets/counts fit inline in their IFD slots; the
    # external arrays exist only for multi-strip layouts
    off_arr_off = bits_off + 6
    cnt_arr_off = off_arr_off + (4 * n_strips if n_strips > 1 else 0)
    data_off = cnt_arr_off + (4 * n_strips if n_strips > 1 else 0)
    offsets = []
    pos = data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        # SHORT values pack into the low 2 bytes of the 4-byte slot,
        # which is the FIRST 2 bytes little-endian but the LAST 2 big-
        # endian-left-justified per spec — pack as two shorts to be exact
        if typ == 3 and count == 1:
            return struct.pack(f"{bo}HHIHH", tag, typ, count, value, 0)
        return struct.pack(f"{bo}HHII", tag, typ, count, value)

    strip_off_val = offsets[0] if n_strips == 1 else off_arr_off
    strip_cnt_val = len(strips[0]) if n_strips == 1 else cnt_arr_off
    ifd = struct.pack(f"{bo}H", n_entries)
    ifd += entry(256, 3, 1, w)                       # ImageWidth
    ifd += entry(257, 3, 1, h)                       # ImageLength
    ifd += entry(258, 3, 3, bits_off)                # BitsPerSample → array
    ifd += entry(259, 3, 1, 32773 if packbits else 1)  # Compression
    ifd += entry(262, 3, 1, 2)                       # Photometric: RGB
    ifd += entry(273, 4, n_strips, strip_off_val)    # StripOffsets
    ifd += entry(277, 3, 1, 3)                       # SamplesPerPixel
    ifd += entry(278, 3, 1, rps)                     # RowsPerStrip
    ifd += entry(279, 4, n_strips, strip_cnt_val)    # StripByteCounts
    ifd += struct.pack(f"{bo}I", 0)                  # next IFD
    out = struct.pack(f"{bo}2sHI", b"MM" if big_endian else b"II", 42, 8)
    out += ifd
    out += struct.pack(f"{bo}HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"{bo}{n_strips}I", *offsets)
        out += struct.pack(f"{bo}{n_strips}I", *[len(s) for s in strips])
    return out + b"".join(strips)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (h, w, 3) uint8 RGB. Reads either byte
    order, multi-strip layouts, SHORT or LONG tag storage, Compression 1
    (none) and 32773 (PackBits), photometric RGB (chunky) and 8-bit
    grayscale (expanded to RGB). Outside that subset (tiles, planar,
    LZW/deflate, non-8-bit) raises ValueError — the documented plug
    point stays for exotic TIFF."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("TIFF: truncated header")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", payload, 2)
    if magic != 42:
        raise ValueError(f"TIFF: bad magic {magic}")
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF: truncated IFD offset")
    (n_entries,) = struct.unpack_from(f"{bo}H", payload, ifd_off)
    if ifd_off + 2 + n_entries * 12 + 4 > len(payload):
        raise ValueError("TIFF: truncated IFD")
    _TYPE_SIZE = {1: 1, 3: 2, 4: 4}

    def values(typ: int, count: int, slot_off: int) -> list[int]:
        size = _TYPE_SIZE.get(typ)
        if size is None:
            raise ValueError(f"TIFF: unsupported tag type {typ}")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        if size * count <= 4:
            base = slot_off
        else:
            (base,) = struct.unpack_from(f"{bo}I", payload, slot_off)
            if base + size * count > len(payload):
                raise ValueError("TIFF: tag value array out of bounds")
        return list(struct.unpack_from(f"{bo}{count}{fmt}", payload, base))

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(f"{bo}HHI", payload, off)
        tags[tag] = values(typ, count, off + 8)
    try:
        w, h = tags[256][0], tags[257][0]
        strip_offs, strip_cnts = tags[273], tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF: missing required tag {e}") from None
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"TIFF: only 8-bit samples supported, got {bits}")
    if compression not in (1, 32773):
        raise ValueError(f"TIFF: unsupported compression {compression}")
    if (photometric, spp) not in ((2, 3), (1, 1), (0, 1)):
        raise ValueError(
            f"TIFF: unsupported photometric/samples ({photometric}, {spp})"
        )
    if len(strip_offs) != len(strip_cnts):
        raise ValueError("TIFF: StripOffsets/StripByteCounts length mismatch")
    rps = tags.get(278, [h])[0] or h
    raw = bytearray()
    for i, (so, sc) in enumerate(zip(strip_offs, strip_cnts)):
        if so + sc > len(payload):
            raise ValueError("TIFF: strip out of bounds")
        strip = payload[so : so + sc]
        n_rows = min(rps, h - i * rps)
        if n_rows <= 0:
            raise ValueError("TIFF: more strips than image rows")
        if compression == 32773:
            raw += _packbits_decompress(strip, n_rows * w * spp)
        else:
            if sc != n_rows * w * spp:
                raise ValueError("TIFF: strip byte count mismatch")
            raw += strip
    if len(raw) != h * w * spp:
        raise ValueError("TIFF: assembled strips do not cover the raster")
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        gray = arr[:, :, 0]
        if photometric == 0:  # min-is-white
            gray = 255 - gray
        arr = np.stack([gray] * 3, axis=2)
    return arr


# ---------------------------------------------------------------------------
# Shared ops
# ---------------------------------------------------------------------------

#: magic-byte sniffing → decoder
DECODERS = {
    b"P6": decode_ppm,
    b"BM": decode_bmp,
    PNG_SIG[:2]: decode_png,
    b"\xff\xd8": decode_jpeg,
    b"GI": decode_gif,
    b"II": decode_tiff,
    b"MM": decode_tiff,
}


def _pil_decode(payload: bytes) -> np.ndarray:
    """Optional PIL plug point for media beyond the pure-NumPy set
    (WebP, exotic TIFF — tiles/LZW, …): used only when Pillow is importable — the container
    ships without it, so this path is exercised by a skip-marked test."""
    import io

    from PIL import Image  # noqa: PLC0415 — optional dependency

    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff magic bytes and decode with the pure-NumPy codecs; for media
    beyond them (WebP, exotic TIFF, …) fall back to PIL when it is installed, else
    raise NotImplementedError — the documented plug point in
    sources/multimodal.py."""
    dec = DECODERS.get(bytes(payload[:2]))
    if dec is not None:
        return dec(payload)
    try:
        return _pil_decode(payload)
    except ImportError:
        raise NotImplementedError(
            f"no pure-NumPy decoder for magic {bytes(payload[:2])!r}; plug in PIL/ffmpeg"
        ) from None


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index mapping (pure NumPy)."""
    h, w, _ = pixels.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]
