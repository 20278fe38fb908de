"""Multimodal columns: image/audio/video as opaque binary + metadata.

North-star surface for LLM-data pipelines. Media payloads are opaque
``binary`` columns with a typed metadata struct; decode / feature
extraction / resize / frame sampling run as Arrow-batched Pandas UDFs
over ``mapInPandas`` — the only place Python touches rows, and it
touches them in columnar batches.

DECODE IS REAL FOR UNCOMPRESSED FORMATS, STUBBED FOR CODEC FORMATS.
The container has no codec libraries (no PIL/ffmpeg), but formats
that need none are decoded for real with stdlib + numpy:

* WAV audio — ``_decode_wav`` (stdlib ``wave`` container parse, PCM →
  rms / zero-crossing rate / FFT spectral centroid / band energies);
  verified against closed-form sine physics by ``audio_wav_metrics``.
* 24-bit BMP images — ``_decode_bmp`` / ``_encode_bmp`` (struct
  headers, padded bottom-up BGR rows) with real pixel-statistics
  features and a REAL nearest-neighbor ``resize_images`` path;
  verified against closed-form gradient statistics by
  ``image_bmp_metrics``.
* 8-bit PNG images (r6) — ``_decode_png`` / ``_encode_png``: chunk
  walk + stdlib-zlib inflate + full five-filter scanline
  unfiltering (None/Sub/Up/Average/Paeth) in numpy; gray/RGB/RGBA,
  non-interlaced. PNG's DEFLATE needs no codec library, so features,
  aHash, and resize are REAL for PNG too — verified
  format-invariant against the BMP twin of the same pixels.
* Y4M video (r6) — ``_decode_y4m`` / ``synth_y4m`` /
  ``sample_video_frames``: the yuv4mpeg2 container is raw planar
  frames behind a text header, so VIDEO decode + frame sampling are
  real too (C444/C420/Cmono, BT.601 conversion; neutral chroma ⇒
  RGB equals luma exactly — the closed-form check). Sampled frames
  re-encode as PNG, so the whole image path (features / aHash /
  scene cuts) runs on real video frames unchanged.
* GIF87a/89a (r6) — ``_decode_gif`` / ``_encode_gif`` / ``synth_gif``:
  pure-Python GIF-variant LZW (variable-width codes, table growth,
  KwKwK, 12-bit reset), global/local palettes, interlace, GCE
  transparency, frame-rect compositing. Single images feed
  ``_decode_rgb``; animated GIFs are a second REAL video source for
  ``sample_video_frames``. Decoder verified differentially against
  the in-module LZW encoder across palette widths and table-reset-
  forcing streams.

* JPEG, baseline AND progressive (r7) — ``_decode_jpeg`` /
  ``_encode_jpeg`` / ``_encode_jpeg_progressive`` / ``synth_jpeg``:
  full marker walk, DQT/DHT parse with canonical Huffman rebuild,
  restart markers, exact float64 IDCT, 4:4:4 / 4:2:0 assembly, JFIF
  YCbCr→RGB. Scans of any script accumulate into a per-component
  coefficient store (baseline = the one-scan special case): spectral
  selection, successive approximation (DC and AC first + refinement
  passes), EOBRUN, non-interleaved scans. Two independent encoders
  are the differential: grayscale block-constant content round-trips
  EXACTLY through baseline, and the progressive encoding of ANY
  image must decode pixel-identical to its baseline encoding.
  Arithmetic-coded/12-bit/hierarchical return None.

* compressed WAV audio (r7) — G.711 u-law / A-law (exhaustively
  bit-identical to stdlib audioop's independent C implementation)
  and IMA/DVI ADPCM (block headers + serial nibble recurrence,
  differentially equal to audioop's DVI core) decode through the
  same REAL signal-metrics pipeline as PCM; encoders are the synth
  twins.

Perceptual codecs (MP3/AAC/Vorbis) fall back to a clearly-marked
DETERMINISTIC FAKE (features derived from a stable hash of the
payload bytes); PIL is tried first if it ever lands. The Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape —
is identical on both paths.

Scale notes: media rows are wide (payload) and features are narrow —
``extract_*`` projects the payload away immediately so the shuffle
after feature extraction carries only features. Partition on the id,
not the payload. For very large blobs store pointers (path + offset)
in the binary column's place and fetch inside the UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_DIM = 16


def _stable_floats(payload: bytes, n: int, salt: bytes = b"") -> list[float]:
    """DETERMINISTIC FAKE feature vector: sha256-expanded payload
    bytes → floats in [0, 1). Replace with a real model/codec."""
    out: list[float] = []
    counter = 0
    while len(out) < n:
        h = hashlib.sha256(salt + counter.to_bytes(4, "big") + payload).digest()
        out.extend(b / 255.0 for b in h[:8])
        counter += 1
    return out[:n]


def _encode_bmp(px_rgb: "object") -> bytes:
    """Encode an HxWx3 RGB uint8 array as an uncompressed 24-bit BMP
    (bottom-up, BGR, 4-byte row padding). Pure struct+numpy."""
    import struct

    import numpy as np

    px = np.asarray(px_rgb, dtype=np.uint8)
    height, width = px.shape[:2]
    bgr = px[:, :, ::-1]
    pad = (-(width * 3)) % 4
    rows = [
        bgr[r].tobytes() + b"\x00" * pad
        for r in range(height - 1, -1, -1)  # bottom-up row order
    ]
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
        2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return file_hdr + info + pixels


def synth_bmp(width: int, height: int, blue: int,
              rg_step: int = 16) -> bytes:
    """Deterministic 24-bit uncompressed BMP: R ramps with x
    (``x*rg_step``), G ramps with y, B constant — closed-form channel
    means for the physics-verified decode check. Pure struct+numpy;
    no codec involved."""
    import numpy as np

    x = (np.arange(width) * rg_step).clip(0, 255).astype(np.uint8)
    y = (np.arange(height) * rg_step).clip(0, 255).astype(np.uint8)
    px = np.zeros((height, width, 3), dtype=np.uint8)  # RGB
    px[:, :, 0] = x[None, :]
    px[:, :, 1] = y[:, None]
    px[:, :, 2] = blue & 0xFF
    return _encode_bmp(px)


def _decode_bmp(payload: bytes) -> tuple[int, int, "object"] | None:
    """REAL image decode for uncompressed 24-bit BMP: struct parses
    the headers, numpy reads the padded bottom-up BGR rows. Returns
    (width, height, HxWx3 RGB uint8 array) or None if the payload is
    not a BMP this decoder supports."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        offset = struct.unpack_from("<I", payload, 10)[0]
        size, width, height, planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
    except struct.error:
        return None
    if size < 40 or bpp != 24 or comp != 0 or width <= 0 or height == 0:
        return None
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if len(payload) < offset + stride * height:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=offset
    ).reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return width, height, rows[:, :, ::-1]  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _encode_png(px_rgb: "object") -> bytes:
    """Encode an HxWx3 RGB uint8 array as an 8-bit truecolor PNG
    (filter 0 scanlines, one zlib IDAT). Pure stdlib zlib/struct —
    no codec library involved."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px_rgb, dtype=np.uint8)
    height, width = px.shape[:2]
    raw = b"".join(
        b"\x00" + px[y].tobytes() for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_png(width: int, height: int, blue: int,
              rg_step: int = 16) -> bytes:
    """The ``synth_bmp`` gradient encoded as a PNG — same pixels, so
    format-invariance of every downstream feature is testable by
    construction (decode(synth_png(...)) ≡ decode(synth_bmp(...)))."""
    import numpy as np

    x = (np.arange(width) * rg_step).clip(0, 255).astype(np.uint8)
    y = (np.arange(height) * rg_step).clip(0, 255).astype(np.uint8)
    px = np.zeros((height, width, 3), dtype=np.uint8)
    px[:, :, 0] = x[None, :]
    px[:, :, 1] = y[:, None]
    px[:, :, 2] = blue & 0xFF
    return _encode_png(px)


def _decode_png(payload: bytes) -> tuple[int, int, "object"] | None:
    """REAL image decode for non-interlaced PNG (r6; palette r7):
    chunk walk, zlib inflate, and full scanline unfiltering (all five
    filter types — None/Sub/Up/Average/Paeth) in numpy. Supports
    8-bit grayscale (expanded to RGB), truecolor, truecolor+alpha
    (alpha dropped), AND palette color (type 3) at bit depths
    1/2/4/8 with MSB-first index unpacking and PLTE lookup — the
    color type real-world icon/logo PNGs actually use. PNG needs no
    codec library — DEFLATE is stdlib zlib — so this is a real
    decode path, not a stub. Returns (width, height, HxWx3 RGB uint8
    array) or None if the payload is not a PNG this decoder
    supports."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"PLTE":
            if ln % 3:
                return None
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, ctype_, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    paletted = ctype_ == 3
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype_)
    if (
        channels is None or comp != 0 or filt != 0
        or interlace != 0 or w == 0 or h == 0
    ):
        return None
    if paletted:
        if depth not in (1, 2, 4, 8) or plte is None or not len(plte):
            return None
    elif depth != 8:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    # scanline stride in BYTES (sub-byte palette indices pack
    # MSB-first); filters always operate on bytes with bpp =
    # max(1, channels*depth//8)
    stride = (w * channels * depth + 7) // 8
    if len(raw) != h * (stride + 1):
        return None
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    lines = arr[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    bpp = max(1, channels * depth // 8)  # filter distance in bytes
    zero = np.zeros(stride, dtype=np.int64)
    for yrow in range(h):
        f = int(ftypes[yrow])
        cur = lines[yrow].copy()
        prev = out[yrow - 1] if yrow else zero
        if f == 0:
            rec = cur
        elif f == 2:  # Up — vectorized
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 1:
                    rec[x] = (rec[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (rec[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    rec[x] = (rec[x] + pr) & 0xFF
        else:
            return None
        out[yrow] = rec
    recon = out.astype(np.uint8)
    if paletted:
        if depth == 8:
            idx = recon[:, :w]
        else:
            # unpack MSB-first sub-byte indices, then crop row padding
            bits = np.unpackbits(recon, axis=1)
            per = bits.reshape(h, -1, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            idx = (per * weights).sum(axis=2)[:, :w]
        if int(idx.max()) >= len(plte):
            return None
        return int(w), int(h), plte[idx]
    px = recon.reshape(h, w, channels)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    elif channels == 4:
        px = px[:, :, :3]
    return int(w), int(h), px


def _decode_rgb(payload: bytes) -> tuple[int, int, "object"] | None:
    """Dispatch over the REAL in-container decoders (BMP, PNG, JPEG
    incl. progressive/12-bit/lossless, GIF first-frame, TIFF, ICO).
    Returns (width, height, HxWx3 RGB uint8) or None."""
    decoded = _decode_bmp(payload)
    if decoded is None:
        decoded = _decode_png(payload)
    if decoded is None:
        decoded = _decode_jpeg(payload)
    if decoded is None:
        gif = _decode_gif(payload)
        if gif is not None:
            w, h, frames = gif
            decoded = (w, h, frames[0])
    if decoded is None:
        decoded = _decode_tiff(payload)
    if decoded is None:
        decoded = _decode_ico(payload)
    if decoded is None:
        decoded = _decode_netpbm(payload)
    return decoded


def _netpbm_header(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Header-only netpbm tokenizer: magic + whitespace-separated ints
    with '#' comments. Returns (kind, width, height, maxval, pos)
    where pos is the offset just past the last header token, or None
    for a malformed header. O(header bytes) — never touches samples,
    so the catalog probe can classify a multi-megabyte ASCII PPM at
    header cost (ADVICE r8)."""
    if len(payload) < 3 or payload[0:1] != b"P" or payload[1] not in b"123456":
        return None
    kind = payload[1] - 0x30
    pos = 2
    tokens_needed = 2 if kind in (1, 4) else 3
    vals: list[int] = []
    while len(vals) < tokens_needed:
        while pos < len(payload) and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < len(payload) and payload[pos] == 0x23:  # '#'
            while pos < len(payload) and payload[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos] in b"0123456789":
            pos += 1
        if pos == start:
            return None
        vals.append(int(payload[start:pos]))
    w, h = vals[0], vals[1]
    maxval = vals[2] if tokens_needed == 3 else 1
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 65535:
        return None
    return kind, w, h, maxval, pos


def _decode_netpbm(payload: bytes) -> tuple[int, int, "object"] | None:
    """REAL image decode for the netpbm family (r8): P1/P4 bitmap
    (1 = black), P2/P5 graymap, P3/P6 pixmap — ASCII and binary
    variants, '#' comments, maxval scaling (incl. 16-bit binary
    big-endian). Returns (width, height, HxWx3 RGB uint8) or None.
    Validated on CPython's real python.ppm/pgm/pbm masters (same
    logo as the TIFF/JPEG twins)."""
    import numpy as np

    hdr = _netpbm_header(payload)
    if hdr is None:
        return None
    kind, w, h, maxval, pos = hdr
    try:
        if kind >= 4:  # binary: exactly ONE whitespace after header
            pos += 1
            body = payload[pos:]
            if kind == 4:
                stride = (w + 7) // 8
                if len(body) < stride * h:
                    return None
                bits = np.unpackbits(
                    np.frombuffer(body, np.uint8, count=stride * h).reshape(
                        h, stride
                    ),
                    axis=1,
                )[:, :w]
                g = ((1 - bits) * 255).astype(np.uint8)  # 1 = black
                return int(w), int(h), np.stack([g, g, g], axis=2)
            nch = 3 if kind == 6 else 1
            n = w * h * nch
            if maxval > 255:
                if len(body) < 2 * n:
                    return None
                arr = np.frombuffer(body, ">u2", count=n).astype(np.float64)
            else:
                if len(body) < n:
                    return None
                arr = np.frombuffer(body, np.uint8, count=n).astype(
                    np.float64
                )
        else:  # ASCII sample values
            nch = 3 if kind == 3 else 1
            n = w * h * (1 if kind == 1 else nch)
            samples: list[int] = []
            while len(samples) < n and pos < len(payload):
                while pos < len(payload) and payload[pos] in b" \t\r\n":
                    pos += 1
                if pos < len(payload) and payload[pos] == 0x23:
                    while pos < len(payload) and payload[pos] not in b"\r\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(payload) and payload[pos] in b"0123456789":
                    pos += 1
                if pos == start:
                    return None
                samples.append(int(payload[start:pos]))
            if len(samples) < n:
                return None
            if kind == 1:
                g = ((1 - np.asarray(samples[:n])) * 255).astype(np.uint8)
                return int(w), int(h), np.stack(
                    [g.reshape(h, w)] * 3, axis=2
                )
            arr = np.asarray(samples[:n], dtype=np.float64)
        px = np.rint(arr * (255.0 / maxval)).clip(0, 255).astype(np.uint8)
        if nch == 1:
            g = px.reshape(h, w)
            return int(w), int(h), np.stack([g, g, g], axis=2)
        return int(w), int(h), px.reshape(h, w, 3)
    except (ValueError, IndexError, OverflowError):
        return None


def _encode_tiff(px_rgb, packbits: bool = False) -> bytes:
    """Encode an HxWx3 RGB uint8 array as a baseline little-endian
    TIFF (one strip, chunky, 8-bit RGB; optional PackBits) — the
    synth twin for `_decode_tiff`. Pure struct, no library."""
    import struct

    import numpy as np

    px = np.asarray(px_rgb, dtype=np.uint8)
    h, w = px.shape[:2]
    data = px.tobytes()
    comp = 1
    if packbits:
        comp = 32773
        out = bytearray()
        i = 0
        while i < len(data):
            chunk = data[i : i + 128]
            out.append(len(chunk) - 1)
            out += chunk
            i += 128
        data = bytes(out)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None),
        (259, 3, 1, comp), (262, 3, 1, 2), (273, 4, 1, None),
        (277, 3, 1, 3), (278, 3, 1, h), (279, 4, 1, len(data)),
    ]
    n = len(entries)
    bits_off = 8 + 2 + 12 * n + 4
    data_off = bits_off + 6
    buf = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    buf += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if tag == 258:
            val = bits_off
        if tag == 273:
            val = data_off
        buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)
    buf += struct.pack("<HHH", 8, 8, 8)
    buf += data
    return bytes(buf)


def _encode_ico_png(px_rgb) -> bytes:
    """Wrap an image as a 1-entry ICO with an embedded PNG payload
    (the layout real 256px icon entries use) — the synth twin for
    `_decode_ico`'s PNG path."""
    import struct

    import numpy as np

    px = np.asarray(px_rgb, dtype=np.uint8)
    h, w = px.shape[:2]
    png = _encode_png(px)
    return (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(png), 22
        )
        + png
    )


def _decode_tiff(payload: bytes) -> tuple[int, int, "object"] | None:
    """REAL image decode for baseline TIFF (r8): II/MM byte order,
    first-IFD tag walk, strip assembly; uncompressed (compression 1)
    and PackBits (32773); photometric 0/1 (8-bit gray, white-is-zero
    inverted), 2 (8-bit RGB, extra samples such as alpha dropped),
    3 (palette via the 16-bit ColorMap, high byte). Chunky planar
    config only; other shapes degrade to None — LZW/JPEG-in-TIFF
    stay honestly undecoded. Validated against CPython's real
    python.tiff (uncompressed 16×16 RGBA)."""
    import struct

    import numpy as np

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if payload[:2] == b"II" else ">"
    try:
        magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
        if magic != 42:
            return None
        (n_ent,) = struct.unpack_from(bo + "H", payload, ifd_off)
        tags: dict = {}
        tsize = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
        tfmt = {1: "B", 3: "H", 4: "I"}
        for i in range(n_ent):
            tag, typ, cnt, raw = struct.unpack_from(
                bo + "HHII", payload, ifd_off + 2 + 12 * i
            )
            if typ not in tfmt:
                continue  # unsupported value type: treat tag as absent
            total = tsize[typ] * cnt
            # corrupt-stream guard: a mutated count field can claim
            # billions of values — the format string alone would
            # allocate GBs; nothing valid exceeds the payload
            if total > len(payload):
                return None
            if total <= 4:
                vals = struct.unpack_from(
                    bo + tfmt[typ] * cnt, payload, ifd_off + 10 + 12 * i
                )
            else:
                vals = struct.unpack_from(bo + tfmt[typ] * cnt, payload, raw)
            tags[tag] = list(vals)

        def one(tag, default=None):
            v = tags.get(tag)
            return v[0] if v else default

        w, h = one(256), one(257)
        comp = one(259, 1)
        photo = one(262)
        spp = one(277, 1)
        bits = tags.get(258, [1])
        rows_per = one(278, h)
        offs = tags.get(273)
        cnts = tags.get(279)
        planar = one(284, 1)
        if (
            not w or not h or photo is None or offs is None
            or comp not in (1, 32773) or planar != 1
            or any(b != 8 for b in bits[: min(spp, 3)])
        ):
            return None
        if cnts is None:
            if comp != 1 or len(offs) != 1:
                return None
            cnts = [w * h * spp]
        raw = bytearray()
        for off, cnt in zip(offs, cnts):
            strip = payload[off : off + cnt]
            if len(strip) < cnt:
                return None
            if comp == 32773:  # PackBits (Apple RLE)
                out = bytearray()
                i = 0
                while i < len(strip):
                    n = strip[i]
                    i += 1
                    if n < 128:
                        out += strip[i : i + n + 1]
                        i += n + 1
                    elif n > 128:
                        out += strip[i : i + 1] * (257 - n)
                        i += 1
                    # 128: no-op
                strip = bytes(out)
            raw += strip
        need = w * h * spp
        if len(raw) < need:
            return None
        px = np.frombuffer(bytes(raw), np.uint8, count=need).reshape(
            h, w, spp
        )
        if photo == 3:  # palette: ColorMap is 3×2^bits 16-bit values
            cmap = tags.get(320)
            if not cmap or spp != 1:
                return None
            third = len(cmap) // 3
            lut = (
                np.asarray(cmap, dtype=np.uint16).reshape(3, third).T >> 8
            ).astype(np.uint8)
            return int(w), int(h), lut[px[:, :, 0]]
        if photo in (0, 1):
            g = px[:, :, 0]
            if photo == 0:  # white-is-zero
                g = 255 - g
            return int(w), int(h), np.stack([g, g, g], axis=2)
        if photo == 2 and spp >= 3:
            return int(w), int(h), px[:, :, :3].copy()
        return None
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _decode_ico(payload: bytes) -> tuple[int, int, "object"] | None:
    """REAL image decode for Windows ICO (r8): directory walk, pick
    the LARGEST entry, decode it — either an embedded PNG (real icons
    ship the 256px size as PNG — reuses `_decode_png`) or a 32/24-bit
    BITMAPINFOHEADER DIB (doubled height = XOR image + AND mask;
    bottom-up BGR(A) rows; 32-bit alpha dropped after composite-on-
    black... kept as straight RGB — the metrics path needs RGB).
    Paletted DIB entries degrade to None (honest bound). Validated
    against the real idle.ico shipped with CPython."""
    import struct

    import numpy as np

    if len(payload) < 6:
        return None
    try:
        rsv, typ, cnt = struct.unpack_from("<HHH", payload, 0)
        if rsv != 0 or typ != 1 or not (1 <= cnt <= 64):
            return None
        if len(payload) < 6 + 16 * cnt:
            return None
        best = None
        for i in range(cnt):
            w8, h8, _, _, _, bpp, size, off = struct.unpack_from(
                "<BBBBHHII", payload, 6 + 16 * i
            )
            w, h = w8 or 256, h8 or 256
            if off + size > len(payload):
                return None
            if best is None or w * h > best[0] * best[1]:
                best = (w, h, off, size)
        w, h, off, size = best
        body = payload[off : off + size]
        if body[:8] == _PNG_SIG:
            return _decode_png(body)
        if len(body) < 40:
            return None
        bisize, bw, bh, planes, bpp, comp = struct.unpack_from(
            "<IiiHHI", body, 0
        )
        if bisize < 40 or comp != 0 or bpp not in (24, 32):
            return None
        # bh counts XOR + AND mask rows
        if bh != 2 * h or bw != w:
            return None
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        data_off = bisize
        if len(body) < data_off + stride * h:
            return None
        rows = np.frombuffer(
            body, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        rgb = rows[::-1, :, 2::-1].copy()  # bottom-up BGR(A) → RGB
        return int(w), int(h), rgb
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """(width, height, features). Real decode for formats this
    container can parse (PIL if present; uncompressed BMP always);
    deterministic fake otherwise.

    Real-path features (16): per-channel mean/std/min/max in [0,1]
    (12), mean luminance, luminance std, aspect ratio, pixel count
    (log-scaled) — actual image statistics, not hashes."""
    bmp = _decode_rgb(payload)
    if bmp is not None:
        import math

        import numpy as np

        w, h, px = bmp
        f = px.astype(np.float64) / 255.0
        lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        feats: list[float] = []
        for c in range(3):
            ch = f[:, :, c]
            feats += [float(ch.mean()), float(ch.std()),
                      float(ch.min()), float(ch.max())]
        feats += [
            float(lum.mean()),
            float(lum.std()),
            w / h,
            math.log10(w * h),
        ]
        return w, h, feats[:IMAGE_FEATURE_DIM]
    try:  # pragma: no cover - container has no PIL
        from PIL import Image  # type: ignore
        import io

        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        # A real featurizer would run here (e.g. pooled embeddings).
        return w, h, _stable_floats(payload, IMAGE_FEATURE_DIM)
    except Exception:
        fake = _stable_floats(payload, IMAGE_FEATURE_DIM)
        w = 64 + int(fake[0] * 64)  # fake-but-deterministic dimensions
        h = 64 + int(fake[1] * 64)
        return w, h, fake


def extract_image_features(df: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    """payload → (id, width, height, features[16]) via mapInPandas.

    Output drops the payload immediately: downstream shuffles carry
    ~150 bytes/row instead of the blob.
    """
    out_schema = (
        f"{id_col} long, width int, height int, "
        f"features array<double>"
    )

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                w, h, feats = _decode_image(bytes(payload))
                rows.append((mid, w, h, feats))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "features"]
            )

    return df.select(id_col, payload_col).mapInPandas(featurize, out_schema)


def synth_bmp_vstripes(width: int, height: int, bright_cols: int,
                       base: int, bright: int, shift: int = 0) -> bytes:
    """Deterministic grayscale (r=g=b) vertical-stripe BMP: the first
    ``bright_cols`` pixel columns at ``bright+shift``, the rest at
    ``base+shift``. Equal channels + constant 2×2 blocks make every
    perceptual-hash intermediate (gray, pooled mean) an exact
    integer, so the aHash has a closed form the oracle can state."""
    import numpy as np

    px = np.full((height, width, 3), min(base + shift, 255), dtype=np.uint8)
    px[:, :bright_cols, :] = min(bright + shift, 255)
    return _encode_bmp(px)


def synth_bmp_phash_pattern(group: int, shift: int = 0,
                            side: int = 32) -> bytes:
    """Deterministic grayscale BMP pattern family for the pHash
    cluster oracle: five mutually-distinct low-frequency layouts
    (vertical/horizontal half split, vertical/horizontal stripes,
    one bright quadrant) at base 40 / bright 200 plus a brightness
    ``shift``. pHash drops DC, so every shift of the same group
    hashes IDENTICALLY (DCT linearity — exact, not approximate),
    while the five groups' low-frequency sign structures differ —
    the closed-form cluster truth the pending oracle states."""
    import numpy as np

    base, bright = 40 + shift, 200 + shift
    px = np.full((side, side, 3), min(base, 255), dtype=np.uint8)
    b = min(bright, 255)
    half, quarter = side // 2, side // 4
    g = group % 5
    if g == 0:
        px[:, :half, :] = b
    elif g == 1:
        px[:half, :, :] = b
    elif g == 2:
        for x0 in range(0, side, half):
            px[:, x0 : x0 + quarter, :] = b
    elif g == 3:
        for y0 in range(0, side, half):
            px[y0 : y0 + quarter, :, :] = b
    else:
        px[:half, :half, :] = b
    return _encode_bmp(px)


def average_hash(df: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload", grid: int = 8) -> DataFrame:
    """REAL perceptual average-hash over decoded image payloads:
    grayscale (channel mean), area-mean-pool to ``grid×grid``,
    threshold strictly above the global pooled mean, pack row-major
    bits (bit ``r·grid+c``) into an int64. Brightness-shift
    invariant by construction — the near-dup property the pair
    queries exploit. Payload-sized data never leaves the UDF; the
    output is 16 bytes/row."""
    out_schema = f"{id_col} long, ahash long"

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        weights = (np.uint64(1) << np.arange(grid * grid, dtype=np.uint64))

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                decoded = _decode_rgb(bytes(payload))
                if decoded is None:
                    continue
                w, h, px = decoded
                if w % grid or h % grid:
                    continue
                gray = px.astype(np.float64).mean(axis=2)
                pooled = gray.reshape(
                    grid, h // grid, grid, w // grid
                ).mean(axis=(1, 3))
                bits = (pooled > pooled.mean()).astype(np.uint64).ravel()
                code = int((bits * weights).sum())
                if code >= 1 << 63:  # two's-complement into int64
                    code -= 1 << 64
                rows.append((int(mid), code))
            yield pd.DataFrame(rows, columns=[id_col, "ahash"])

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix C (C @ x applies the 1-D DCT;
    C @ img @ C.T the 2-D one). Same basis as the JPEG IDCT twin
    (`_idct_blocks`), built here at the pHash working size."""
    import numpy as np

    x = np.arange(n, dtype=np.float64)
    u = x.reshape(-1, 1)
    c = np.cos(np.pi * (2.0 * x + 1.0) * u / (2.0 * n))
    c *= np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


def perceptual_hash(df: DataFrame, id_col: str = "media_id",
                    payload_col: str = "payload", size: int = 32,
                    grid: int = 8) -> DataFrame:
    """REAL DCT perceptual hash (pHash) — the standard upgrade over
    `average_hash` for image near-dup: grayscale (channel mean),
    resample to ``size×size`` (exact area pooling when dims divide,
    nearest-neighbor index maps otherwise — same rule as
    `resize_images`), orthonormal 2-D DCT-II, keep the low-frequency
    ``grid×grid`` corner, drop DC, threshold the remaining
    ``grid²−1`` coefficients strictly above their median, and pack
    bit ``u·grid+v−1`` into an int64 (63 bits — always in signed
    range).

    Dropping DC makes the hash EXACTLY brightness-shift invariant
    (adding a constant moves only the DC coefficient — linearity of
    the DCT), the property the cluster queries pin; thresholding at
    the median keeps the popcount near 63/2 (exactly 31 when the 63
    coefficients are distinct; fewer only under ties) so hamming
    distances are comparable across images — the classic pHash
    design point.

    Scale shape: payloads die inside the UDF; 16 bytes/row continue.
    Near-dup pairing then rides the same hamming-join/banding
    machinery as `simhash` (`operators/dedup.py`)."""
    out_schema = f"{id_col} long, phash long"

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        dct = _dct_matrix(size)
        weights = np.uint64(1) << np.arange(
            grid * grid - 1, dtype=np.uint64
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                decoded = _decode_rgb(bytes(payload))
                if decoded is None:
                    continue
                w, h, px = decoded
                gray = px.astype(np.float64).mean(axis=2)
                if w % size == 0 and h % size == 0:
                    gray = gray.reshape(
                        size, h // size, size, w // size
                    ).mean(axis=(1, 3))
                else:
                    xi = (np.arange(size) * w) // size
                    yi = (np.arange(size) * h) // size
                    gray = gray[yi][:, xi]
                low = (dct @ gray @ dct.T)[:grid, :grid]
                # snap to a 1e-6 grid before the median compare: the
                # exact-math coefficients of shifted/pooled twins
                # differ by O(1e-13) float noise, which would flip
                # bits tied at the median (the engine's usual
                # round-at-grid determinism policy)
                ac = np.round(low.ravel()[1:], 6)
                bits = (ac > np.median(ac)).astype(np.uint64)
                rows.append((int(mid), int((bits * weights).sum())))
            yield pd.DataFrame(rows, columns=[id_col, "phash"])

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


def sample_frame_offsets(df: DataFrame, n_frames: int = 4,
                         duration_col: str = "meta.duration_ms") -> DataFrame:
    """Video frame-sampling PLAN: evenly spaced frame timestamps from
    the metadata — pure native expressions (the expensive decode of
    each chosen frame would then run through extract_image_features).
    Output: one row per (media_id, frame_idx, frame_offset_ms).
    """
    dur = F.col(duration_col)
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    offsets = F.transform(
        idx, lambda i: (dur * (i * 2 + 1) / F.lit(2 * n_frames)).cast("long")
    )
    return (
        df.where(dur.isNotNull() & (dur > 0))
        .select(
            "media_id",
            F.posexplode(offsets).alias("frame_idx", "frame_offset_ms"),
        )
    )


def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """GIF-variant LZW encode (LSB-first variable-width codes, CLEAR/
    END, 12-bit cap with table reset) — the fixture side of the
    differential pair; the decoder below must invert it."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(1 << min_code_size)}
    next_code = end + 1
    width = min_code_size + 1
    out_bits: list = []
    out_bits.append((clear, width))
    buf = b""
    for px in indices:
        cand = buf + bytes([px])
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code = end + 1
            width = min_code_size + 1
        buf = bytes([px])
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))
    acc = nb = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nb
        nb += w
        while nb >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode_gif(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF-variant LZW decode: variable code width (grows when the
    table fills the current width, 12-bit cap), CLEAR resets, the
    code==next_table_slot KwKwK case. Stops at END or n_expected."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    table = list(base)
    acc = nb = pos = 0
    out = bytearray()
    prev = None
    while True:
        while nb < width:
            if pos >= len(data):
                return bytes(out)
            acc |= data[pos] << nb
            nb += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nb -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_expected:
            return bytes(out)


def _encode_gif(frames, palette=None) -> bytes:
    """Encode one or more HxWx3 RGB uint8 frames (≤256 distinct
    colors across the clip) as a GIF89a with a global palette and
    real LZW-compressed image data. Fixture-side encoder for the
    differential decode tests and synths."""
    import struct

    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    if palette is None:
        palette = np.unique(
            np.concatenate([f.reshape(-1, 3) for f in frames]), axis=0
        )
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    assert n <= 256, "GIF fixtures need <= 256 distinct colors"
    depth = max(2, int(n - 1).bit_length())
    pal_full = np.zeros(((1 << depth), 3), dtype=np.uint8)
    pal_full[:n] = palette
    lut = {tuple(c): i for i, c in enumerate(palette)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal_full.tobytes()
    for f in frames:
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        idx = [lut[tuple(px)] for px in f.reshape(-1, 3)]
        out.append(depth)  # LZW min code size
        data = _lzw_encode_gif(idx, depth)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def synth_gif(width: int, height: int, blue: int,
              rg_step: int = 16) -> bytes:
    """The ``synth_bmp`` gradient as a GIF (its 16×16 R/G grid plus
    constant B is ≤256 distinct colors by construction) — the
    format-invariance twin for the GIF decode path."""
    import numpy as np

    x = (np.arange(width) * rg_step).clip(0, 255).astype(np.uint8)
    y = (np.arange(height) * rg_step).clip(0, 255).astype(np.uint8)
    px = np.zeros((height, width, 3), dtype=np.uint8)
    px[:, :, 0] = x[None, :]
    px[:, :, 1] = y[:, None]
    px[:, :, 2] = blue & 0xFF
    return _encode_gif(px)


def _decode_gif(payload: bytes):
    """REAL image/animation decode for GIF87a/89a (r6): pure-Python
    LZW (variable-width codes, table growth, KwKwK), global/local
    palettes, frame rects composited onto the logical screen,
    interlaced row order, and GCE transparency (transparent pixels
    keep the previous canvas — disposal "do not dispose"). Returns
    (width, height, [HxWx3 RGB uint8 per frame]) or None."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gpal = None
    if packed & 0x80:
        gsize = 2 << (packed & 0x07)
        if pos + gsize * 3 > len(payload):
            return None
        gpal = np.frombuffer(
            payload, np.uint8, count=gsize * 3, offset=pos
        ).reshape(gsize, 3)
        pos += gsize * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list = []
    transparent = None
    # A corpus-scale decode must DEGRADE on truncated/degenerate
    # payloads, never fail the task: every read below is
    # bounds-checked and returns None (the documented corrupt-input
    # path, same contract as _decode_bmp/_decode_png).
    while pos < len(payload):
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension: label + sub-blocks
            if pos >= len(payload):
                return None
            label = payload[pos]
            pos += 1
            if (
                label == 0xF9
                and pos + 4 < len(payload)
                and payload[pos] >= 4
            ):  # GCE
                flags = payload[pos + 1]
                tindex = payload[pos + 4]
                transparent = tindex if flags & 1 else None
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                return None  # truncated before the block terminator
            pos += 1
            continue
        if intro != 0x2C:
            return None
        if pos + 9 > len(payload):
            return None  # cut-off image descriptor
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fw * fh == 0 or fx + fw > w or fy + fh > h:
            return None  # zero-area or out-of-screen frame rect
        pal = gpal
        if fpacked & 0x80:
            lsize = 2 << (fpacked & 0x07)
            if pos + lsize * 3 > len(payload):
                return None
            pal = np.frombuffer(
                payload, np.uint8, count=lsize * 3, offset=pos
            ).reshape(lsize, 3)
            pos += lsize * 3
        if pal is None or pos >= len(payload):
            return None
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(payload):
            return None  # truncated before the data terminator
        pos += 1
        try:
            idx = np.frombuffer(
                _lzw_decode_gif(bytes(data), mcs, fw * fh), np.uint8
            )
        except ValueError:
            return None
        if len(idx) < fw * fh or int(idx.max()) >= len(pal):
            return None
        grid = idx[: fw * fh].reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: 4-pass row order
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            de = np.empty_like(grid)
            de[np.asarray(order)] = grid
            grid = de
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = pal[grid]
        if transparent is not None:
            mask = (grid != transparent)[:, :, None]
            rgb = np.where(mask, rgb, region)
        canvas[fy : fy + fh, fx : fx + fw] = rgb
        frames.append(canvas.copy())
        transparent = None
    if not frames:
        return None
    return int(w), int(h), frames


# ---------------------------------------------------------------------------
# JPEG (r7): REAL baseline-sequential codec — stdlib struct + numpy,
# no codec library. Decoder: full marker walk (APPn/COM skip, DQT
# 8/16-bit zigzag tables, SOF0, DHT canonical rebuild, SOS, DRI with
# restart-segmented entropy data), per-MCU Huffman decode with DC
# prediction + EXTEND, dequant, de-zigzag, exact float64 IDCT (8x8
# orthonormal DCT-II matrix), sampling-factor plane assembly with
# chroma upsample, JFIF full-range YCbCr→RGB. Encoder: the inverse
# pipeline with per-image canonical Huffman tables built from actual
# symbol frequencies (written as DHT segments — no reliance on the
# Annex K defaults) and the libjpeg dummy-symbol trick so no real
# symbol takes the all-ones code. Progressive (SOF2), 12-bit
# (SOF1 extended sequential / 12-bit progressive, r8), and LOSSLESS
# (SOF3 predictive, Annex H, 2-16 bit, all 7 predictors + point
# transform, r8) are REAL; arithmetic-coded and hierarchical modes
# return None (honest capability boundary — the T.81 Annex D
# QM-coder state table is not reproducible here without the spec,
# and a self-consistent-but-wrong table would be fake interop; same
# degrade contract as the other decoders: corrupt or unsupported
# payloads return None, never raise).
# ---------------------------------------------------------------------------


def _jpeg_zigzag():
    """Zigzag-order permutation: entry k is the natural (row*8+col)
    index of the k-th zigzag element. Generated, not typed, to avoid
    transcription bugs."""
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(7, s) + 1))
        for r in rng if s % 2 else reversed(rng):
            out.append(r * 8 + (s - r))
    return out


_JPEG_ZZ = None  # lazily built numpy array (import numpy only on use)


def _jpeg_zz():
    global _JPEG_ZZ
    if _JPEG_ZZ is None:
        import numpy as np

        _JPEG_ZZ = np.array(_jpeg_zigzag(), dtype=np.int64)
    return _JPEG_ZZ


_JPEG_DCT_M = None


def _jpeg_dct_mat():
    """Orthonormal 8x8 DCT-II matrix M: forward F = M @ A @ M.T,
    inverse A = M.T @ F @ M — exact in float64 far beyond the
    half-ULP the integer rounding needs."""
    global _JPEG_DCT_M
    if _JPEG_DCT_M is None:
        import numpy as np

        k = np.arange(8)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16) * 0.5
        m[0, :] *= 1.0 / np.sqrt(2.0)
        _JPEG_DCT_M = m
    return _JPEG_DCT_M


def _jpeg_extend(v: int, s: int) -> int:
    """ITU T.81 F.2.2.1 EXTEND: map the s-bit magnitude code back to
    the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_category(v: int) -> int:
    return abs(v).bit_length()


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad final byte with 1-bits (spec F.1.2.3)


class _JpegBits:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        if self.pos >= len(self.d) * 8:
            raise ValueError("jpeg: truncated entropy data")
        b = self.d[self.pos >> 3]
        v = (b >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _jpeg_canonical_codes(counts: list[int], values: list[int]):
    """DHT (BITS, HUFFVAL) → {(length, code): symbol} decode map and
    {symbol: (code, length)} encode map, per T.81 C.2."""
    dec: dict = {}
    enc: dict = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            sym = values[vi]
            vi += 1
            dec[(length, code)] = sym
            enc[sym] = (code, length)
            code += 1
        code <<= 1
    return dec, enc


def _jpeg_build_table(freqs: dict) -> tuple[list[int], list[int]]:
    """Canonical Huffman (BITS, HUFFVAL) from symbol frequencies. A
    dummy symbol is added so no REAL symbol gets the all-ones code
    (the libjpeg reservation); if plain Huffman exceeds JPEG's 16-bit
    code limit (possible only on pathological distributions), fall
    back to fixed-length codes — still a valid canonical table."""
    import heapq

    syms = sorted(freqs)
    # dummy reserves the largest (all-ones) code point; 257 can never
    # collide with real symbols (DC cats ≤ 11, AC run/size ≤ 0xFA)
    items = [(freqs[s], s) for s in syms] + [(0, 257)]
    if len(items) == 1:
        return [1] + [0] * 15, syms
    heap = [(f, i, [s]) for i, (f, s) in enumerate(items)]
    heapq.heapify(heap)
    depth: dict = {s: 0 for _, s in items}
    tick = len(items)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tick, s1 + s2))
        tick += 1
    if max(depth.values()) > 16:
        flat = max((len(items) - 1).bit_length(), 1)
        depth = {s: flat for _, s in items}
    # canonical order: by (length, symbol); dummy sorts last at its
    # length, so dropping it frees the largest code of the max length
    ordered = sorted(items, key=lambda fs: (depth[fs[1]], fs[1]))
    counts = [0] * 16
    vals: list[int] = []
    for _, s in ordered:
        if s == 257:
            continue
        counts[depth[s] - 1] += 1
        vals.append(s)
    return counts, vals


def _jpeg_ycbcr_from_rgb(px):
    import numpy as np

    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return [np.rint(p).clip(0, 255) for p in (y, cb, cr)]


def _jpeg_rgb_from_ycbcr(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.rint(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _jpeg_pad(plane, rows: int, cols: int):
    """Edge-replicate pad up to (rows, cols)."""
    import numpy as np

    h, w = plane.shape
    if h == rows and w == cols:
        return plane
    return np.pad(plane, ((0, rows - h), (0, cols - w)), mode="edge")


def _jpeg_quantized_grids(planes, samp, mcx: int, mcy: int,
                          level_shift: float = 128.0):
    """Level-shift, pad, forward-DCT, and quantize (all-ones table)
    every 8x8 block of every component plane. Returns one int64 array
    (nby, nbx, 64) per component, zigzag-ordered — the shared front
    half of the baseline and progressive encoders. ``level_shift`` is
    2^(P−1) — 128 for 8-bit, 2048 for 12-bit (T.81 A.3.1)."""
    import numpy as np

    zz = _jpeg_zz()
    m = _jpeg_dct_mat()
    grids = []
    for (hh, v), plane in zip(samp, planes):
        padded = _jpeg_pad(plane, mcy * 8 * v, mcx * 8 * hh) - level_shift
        nby, nbx = mcy * v, mcx * hh
        blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        coefs = np.einsum("ik,yxkl,jl->yxij", m, blocks, m)
        grids.append(
            np.rint(coefs.reshape(nby, nbx, 64)[:, :, zz]).astype(np.int64)
        )
    return grids


def _jpeg_prep_planes(px, subsample: str):
    """RGB/gray pixels → component planes + sampling factors (shared
    by both encoders)."""
    import numpy as np

    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        return [np.asarray(px, dtype=np.float64)], [(1, 1)], h, w, True
    y, cb, cr = _jpeg_ycbcr_from_rgb(np.asarray(px))
    if subsample == "420":
        if h % 2 or w % 2:
            raise ValueError("jpeg 420 synth requires even dims")
        cb = np.rint(cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
        cr = np.rint(cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)))
        return [y, cb, cr], [(2, 2), (1, 1), (1, 1)], h, w, False
    return [y, cb, cr], [(1, 1), (1, 1), (1, 1)], h, w, False


def _encode_jpeg(px, subsample: str = "444",
                 restart_interval: int = 0, precision: int = 8) -> bytes:
    """Baseline-sequential JFIF encoder: 3-channel HxWx3 uint8 (or
    HxW grayscale → 1-component scan). All-ones quantization tables
    (the near-lossless end of the dial — block-constant content
    round-trips its luma EXACTLY); per-image canonical Huffman
    tables; 4:4:4 or 4:2:0 (box-average chroma); optional DRI +
    RSTn restart markers every ``restart_interval`` MCUs (DC
    predictor reset + byte realignment) so the decoder's
    restart-segmented path is differentially testable.

    ``precision=12`` (r8) writes SOF1 extended-sequential with
    12-bit samples (T.81 Table B.2: baseline SOF0 is 8-bit-only) —
    GRAYSCALE input only (HxW ints 0..4095), level shift 2048, DC
    categories to 15 / AC to 14 exercised by high-contrast content.
    No JFIF APP0 is written in 12-bit mode (JFIF mandates 8-bit
    samples)."""
    import struct

    import numpy as np

    if precision not in (8, 12):
        raise ValueError("jpeg encoder: precision must be 8 or 12")
    if precision == 12:
        if np.asarray(px).ndim != 2:
            raise ValueError("jpeg 12-bit encoder twin is grayscale-only")
        if int(np.asarray(px).max(initial=0)) > 4095 or (
            int(np.asarray(px).min(initial=0)) < 0
        ):
            raise ValueError("jpeg 12-bit samples must be in [0, 4095]")
    planes, samp, h, w, gray = _jpeg_prep_planes(px, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    grids = _jpeg_quantized_grids(
        planes, samp, mcx, mcy, level_shift=float(1 << (precision - 1))
    )

    # pass 1: quantized zigzag coefficients per block, MCU-interleaved
    blocks: list = []  # (mcu_idx, comp_idx, qcoef int64[64])
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (hh, v) in enumerate(samp):
                for by in range(v):
                    for bx in range(hh):
                        blocks.append(
                            (my * mcx + mx, ci,
                             grids[ci][my * v + by][mx * hh + bx])
                        )

    # pass 2: symbol stream + frequencies (luma tables = comp 0,
    # chroma tables shared by comps 1/2 — the standard arrangement).
    # DC predictors reset at restart boundaries, matching T.81 E.2.4.
    def tclass(ci: int) -> int:
        return 0 if ci == 0 else 1

    dc_freq: list[dict] = [{}, {}]
    ac_freq: list[dict] = [{}, {}]
    stream: list = []  # (kind, tbl, sym, extra_val, extra_len)
    mcu_start: dict = {}  # mcu_idx -> stream index of its first symbol
    preds = [0] * len(planes)
    for mcu_idx, ci, q in blocks:
        if restart_interval and mcu_idx % restart_interval == 0 and (
            mcu_idx not in mcu_start
        ):
            preds = [0] * len(planes)
        mcu_start.setdefault(mcu_idx, len(stream))
        t = tclass(ci)
        diff = int(q[0]) - preds[ci]
        preds[ci] = int(q[0])
        s = _jpeg_category(diff)
        dc_freq[t][s] = dc_freq[t].get(s, 0) + 1
        extra = diff if diff >= 0 else diff + (1 << s) - 1
        stream.append(("dc", t, s, extra, s))
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if q[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(q[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_freq[t][0xF0] = ac_freq[t].get(0xF0, 0) + 1
                stream.append(("ac", t, 0xF0, 0, 0))
                run -= 16
            s = _jpeg_category(v)
            sym = (run << 4) | s
            ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1
            extra = v if v >= 0 else v + (1 << s) - 1
            stream.append(("ac", t, sym, extra, s))
            run = 0
        if last_nz < 63:
            ac_freq[t][0x00] = ac_freq[t].get(0x00, 0) + 1
            stream.append(("ac", t, 0x00, 0, 0))

    n_t = 1 if gray else 2
    dc_tabs = [_jpeg_build_table(dc_freq[t]) for t in range(n_t)]
    ac_tabs = [_jpeg_build_table(ac_freq[t]) for t in range(n_t)]
    dc_enc = [_jpeg_canonical_codes(*tab)[1] for tab in dc_tabs]
    ac_enc = [_jpeg_canonical_codes(*tab)[1] for tab in ac_tabs]

    restart_at = {
        mcu_start[i]: (i // restart_interval - 1) % 8
        for i in mcu_start
        if restart_interval and i and i % restart_interval == 0
    }
    bw = _JpegBitWriter()
    for si, (kind, t, sym, extra, elen) in enumerate(stream):
        rst = restart_at.get(si)
        if rst is not None:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + rst])
        code, ln = (dc_enc if kind == "dc" else ac_enc)[t][sym]
        bw.write(code, ln)
        if elen:
            bw.write(extra, elen)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    if precision == 8:  # JFIF APP0 is defined for 8-bit samples only
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        out += struct.pack(">HHBB", 1, 1, 0, 0)  # density + no thumbnail
    # DQT: one all-ones 8-bit table used by every component
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([1] * 64)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = len(planes)
    sof_marker = b"\xff\xc0" if precision == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp
    )
    for ci, (hh, v) in enumerate(samp):
        out += struct.pack(">BBB", ci + 1, (hh << 4) | v, 0)
    for t in range(n_t):
        for cls, (counts, vals) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            out += b"\xff\xc4"
            out += struct.pack(">HB", 19 + len(vals), (cls << 4) | t)
            out += bytes(counts) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        t = tclass(ci)
        out += struct.pack(">BB", ci + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl (baseline)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_progressive(px, subsample: str = "444",
                             precision: int = 8) -> bytes:
    """Progressive (SOF2) JFIF encoder — the spec-differential twin
    for the decoder's progressive paths. Scan script exercises all of
    them: interleaved DC first scan at Al=1 then a DC refinement
    scan (raw bit per block); per-component AC spectral-selection
    bands (1-5, 6-63) first-coded at Al=1 with EOBRUN accumulation;
    per-component AC refinement scans (1-63, Ah=1→Al=0) with the
    G.1.2.3 correction-bit walk (ZRL-in-span, buffered BR bits
    flushed after each EOB/ZRL/newly-significant symbol). Quantized
    coefficients are IDENTICAL to the baseline encoder's, so
    progressive and baseline encodings of the same pixels must
    decode to the same image exactly — the cross-path differential."""
    import struct

    import numpy as np

    if precision not in (8, 12):
        raise ValueError("jpeg encoder: precision must be 8 or 12")
    if precision == 12 and np.asarray(px).ndim != 2:
        raise ValueError("jpeg 12-bit encoder twin is grayscale-only")
    planes, samp, h, w, gray = _jpeg_prep_planes(px, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    grids = _jpeg_quantized_grids(
        planes, samp, mcx, mcy, level_shift=float(1 << (precision - 1))
    )
    ncomp = len(planes)

    def tclass(ci: int) -> int:
        return 0 if ci == 0 else 1

    n_t = 1 if gray else 2

    out = bytearray(b"\xff\xd8")
    if precision == 8:  # JFIF APP0 mandates 8-bit samples
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        out += struct.pack(">HHBB", 1, 1, 0, 0)
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0x00) + bytes([1] * 64)
    out += b"\xff\xc2" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp
    )
    for ci, (hh, v) in enumerate(samp):
        out += struct.pack(">BBB", ci + 1, (hh << 4) | v, 0)

    def comp_blocks(ci):
        """Block grid a NON-interleaved scan walks for component ci
        (true ceil dims, not MCU-padded)."""
        hh, v = samp[ci]
        nbw = -(-(-(-w * hh // hmax)) // 8)
        nbh = -(-(-(-h * v // vmax)) // 8)
        return nbh, nbw

    def emit_scan(stabs, ss, se, ah, al, symbols, table_cls):
        """symbols: list of ('sym', tbl_id, sym) | ('bits', val, n) in
        emission order. Two passes: count → tables → DHT + SOS +
        entropy data appended to `out`."""
        freqs: dict = {}
        for item in symbols:
            if item[0] == "sym":
                _, t, sym = item
                freqs.setdefault(t, {})
                freqs[t][sym] = freqs[t].get(sym, 0) + 1
        encs: dict = {}
        for t, fr in freqs.items():
            counts, vals = _jpeg_build_table(fr)
            encs[t] = _jpeg_canonical_codes(counts, vals)[1]
            out.extend(b"\xff\xc4")
            out.extend(struct.pack(">HB", 19 + len(vals), (table_cls << 4) | t))
            out.extend(bytes(counts) + bytes(vals))
        bw = _JpegBitWriter()
        for item in symbols:
            if item[0] == "sym":
                _, t, sym = item
                code, ln = encs[t][sym]
                bw.write(code, ln)
            else:
                _, val, n = item
                if n:
                    bw.write(val, n)
        bw.flush()
        ns = len(stabs)
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns))
        for cid, td, ta in stabs:
            out.extend(struct.pack(">BB", cid, (td << 4) | ta))
        out.extend(bytes([ss, se, (ah << 4) | al]))
        out.extend(bw.buf)

    # --- scan 1: DC first, interleaved, Al=1 ---
    al = 1
    syms: list = []
    preds = [0] * ncomp
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (hh, v) in enumerate(samp):
                for by in range(v):
                    for bx in range(hh):
                        val = int(grids[ci][my * v + by][mx * hh + bx][0]) >> al
                        diff = val - preds[ci]
                        preds[ci] = val
                        s = _jpeg_category(diff)
                        syms.append(("sym", tclass(ci), s))
                        extra = diff if diff >= 0 else diff + (1 << s) - 1
                        syms.append(("bits", extra, s))
    emit_scan(
        [(ci + 1, tclass(ci), 0) for ci in range(ncomp)],
        0, 0, 0, al, syms, table_cls=0,
    )

    # --- scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits) ---
    syms = []
    for my in range(mcy):
        for mx in range(mcx):
            for ci, (hh, v) in enumerate(samp):
                for by in range(v):
                    for bx in range(hh):
                        bit = int(grids[ci][my * v + by][mx * hh + bx][0]) & 1
                        syms.append(("bits", bit, 1))
    emit_scan(
        [(ci + 1, 0, 0) for ci in range(ncomp)], 0, 0, 1, 0, syms,
        table_cls=0,
    )

    # --- AC first scans: two spectral bands per component, Al=1 ---
    def ac_first_scan(ci, ss, se, al):
        t = tclass(ci)
        syms: list = []
        st = {"eobrun": 0}

        def flush_eob():
            if st["eobrun"]:
                rb = st["eobrun"].bit_length() - 1
                syms.append(("sym", t, rb << 4))
                syms.append(("bits", st["eobrun"] - (1 << rb), rb))
                st["eobrun"] = 0

        nbh, nbw = comp_blocks(ci)
        for bi in range(nbh * nbw):
            by, bx = divmod(bi, nbw)
            c = grids[ci][by][bx]
            r = 0
            wrote = False
            for k in range(ss, se + 1):
                v = int(c[k])
                t2 = abs(v) >> al
                if t2 == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    syms.append(("sym", t, 0xF0))
                    r -= 16
                s = t2.bit_length()
                syms.append(("sym", t, (r << 4) | s))
                # negative magnitudes code as the s-bit one's complement
                mag = t2 if v >= 0 else (t2 ^ ((1 << s) - 1))
                syms.append(("bits", mag, s))
                r = 0
                wrote = True
            if r > 0 or not wrote:
                st["eobrun"] += 1
                if st["eobrun"] == 0x7FFF:
                    flush_eob()
        flush_eob()
        emit_scan([(ci + 1, 0, t)], ss, se, 0, al, syms, table_cls=1)

    for ci in range(ncomp):
        ac_first_scan(ci, 1, 5, 1)
    for ci in range(ncomp):
        ac_first_scan(ci, 6, 63, 1)

    # --- AC refinement scans: Ss=1..63, Ah=1 -> Al=0 (G.1.2.3) ---
    def ac_refine_scan(ci, ss, se, al):
        t = tclass(ci)
        syms: list = []
        st = {"eobrun": 0, "br": []}

        def emit_br():
            for b in st["br"]:
                syms.append(("bits", b, 1))
            st["br"] = []

        def flush_eob():
            if st["eobrun"]:
                rb = st["eobrun"].bit_length() - 1
                syms.append(("sym", t, rb << 4))
                syms.append(("bits", st["eobrun"] - (1 << rb), rb))
                st["eobrun"] = 0
            emit_br()

        nbh, nbw = comp_blocks(ci)
        for bi in range(nbh * nbw):
            by, bx = divmod(bi, nbw)
            c = grids[ci][by][bx]
            absv = [abs(int(c[k])) >> al for k in range(ss, se + 1)]
            eob_abs = ss - 1
            for i, k in enumerate(range(ss, se + 1)):
                if absv[i] == 1:
                    eob_abs = k
            r = 0
            block_br: list = []
            for i, k in enumerate(range(ss, se + 1)):
                temp = absv[i]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_abs:
                    flush_eob()
                    syms.append(("sym", t, 0xF0))
                    r -= 16
                    for b in block_br:
                        syms.append(("bits", b, 1))
                    block_br = []
                if temp > 1:
                    block_br.append(abs(int(c[k])) & 1)
                    continue
                flush_eob()
                syms.append(("sym", t, (r << 4) | 1))
                syms.append(("bits", 1 if int(c[k]) > 0 else 0, 1))
                for b in block_br:
                    syms.append(("bits", b, 1))
                block_br = []
                r = 0
            if r > 0 or block_br:
                st["eobrun"] += 1
                st["br"].extend(block_br)
                if st["eobrun"] == 0x7FFF or len(st["br"]) > 900:
                    flush_eob()
        flush_eob()
        emit_scan([(ci + 1, 0, t)], ss, se, 1, al, syms, table_cls=1)

    for ci in range(ncomp):
        ac_refine_scan(ci, 1, 63, 0)

    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_split_scan(data: bytes, start: int):
    """Unstuff the entropy-coded data from ``start``, splitting at
    restart markers. Returns (segments, position of the terminating
    marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < n else None
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def _jpeg_lossless_predict(
    plane, y: int, x: int, sel: int, default: int
) -> int:
    """T.81 Annex H.1.2.1 prediction from RECONSTRUCTED neighbors
    a (left), b (above), c (above-left). First sample → the default
    2^(P−Pt−1); rest of the first line → predictor 1 (a); first
    column of later lines → predictor 2 (b); otherwise the scan's
    selection value ``sel`` (1..7)."""
    if y == 0:
        if x == 0:
            return default
        return int(plane[0][x - 1])
    if x == 0:
        return int(plane[y - 1][0])
    a = int(plane[y][x - 1])
    b = int(plane[y - 1][x])
    c = int(plane[y - 1][x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def _jpeg_decode_lossless_scan(
    payload, sos_body, seg_end, comps, huff, planes, size, prec: int
):
    """Decode ONE lossless-JPEG (SOF3) scan into the per-component
    sample planes — T.81 Annex H: Huffman-coded DC-style difference
    categories (SSSS ≤ 16; category 16 carries NO extra bits and
    means 32768), EXTEND, prediction per H.1.2.1, reconstruction
    modulo 2^16 (H.1.2.2). Planes receive FULL-scale values
    (sample << Pt). Restart intervals are out of scope (the honest
    bound — encoder never emits DRI for lossless; a DRI'd lossless
    stream degrades upstream). Returns the position after the scan."""
    h, w = size
    ns = sos_body[0]
    stabs = []
    for ci in range(ns):
        cid = sos_body[1 + 2 * ci]
        td = sos_body[2 + 2 * ci] >> 4
        stabs.append((cid, td))
    sel, se, ahal = sos_body[1 + 2 * ns : 4 + 2 * ns]
    pt = ahal & 0xF
    if not (1 <= sel <= 7) or se != 0:
        raise ValueError("jpeg lossless: bad predictor selection")
    if pt >= prec:
        raise ValueError("jpeg lossless: point transform >= precision")
    segs, endpos = _jpeg_split_scan(payload, seg_end)
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    scomps = []
    for cid, td in stabs:
        if cid not in cid_to_ci:
            raise ValueError("jpeg lossless: scan names unknown component")
        dcm = huff.get((0, td))
        if dcm is None:
            raise ValueError("jpeg lossless: missing DC table")
        scomps.append((cid_to_ci[cid], dcm))
    bits = _JpegBits(segs[0])
    default = 1 << (prec - pt - 1)
    # raw (P−Pt)-precision reconstruction planes, per scan component
    recon = {ci: [[0] * w for _ in range(h)] for ci, _ in scomps}

    def next_diff(dcm) -> int:
        s = _jpeg_huff_decode(bits, dcm)
        if s > 16:
            raise ValueError("jpeg lossless: category out of range")
        if s == 16:  # H.2: SSSS=16 codes diff 32768 with no extra bits
            return 32768
        return _jpeg_extend(bits.bits(s), s) if s else 0

    for y in range(h):
        for x in range(w):
            for ci, dcm in scomps:
                pred = _jpeg_lossless_predict(recon[ci], y, x, sel, default)
                v = (pred + next_diff(dcm)) & 0xFFFF
                recon[ci][y][x] = v
                planes[ci][y][x] = v << pt
    return endpos


def _encode_jpeg_lossless(px, predictor: int = 4, precision: int = 8,
                          point_transform: int = 0) -> bytes:
    """Lossless-JPEG (SOF3) encoder twin: HxW grayscale or HxWx3
    samples carried VERBATIM as 1 or 3 components (T.81 specifies no
    color transform for lossless; JFIF's YCbCr contract applies to
    DCT JPEG only, so no APP0 is written). Per-image canonical
    Huffman table over difference categories (0..16), prediction and
    modulo-2^16 differences exactly as the decoder reconstructs —
    decode(encode(x)) == (x >> Pt) << Pt by construction, bit-exact,
    at any precision 2..16."""
    import struct

    import numpy as np

    arr = np.asarray(px, dtype=np.int64)
    if not (2 <= precision <= 16) or not (0 <= point_transform < precision):
        raise ValueError("jpeg lossless: bad precision/point transform")
    if int(arr.max(initial=0)) >= (1 << precision) or int(
        arr.min(initial=0)
    ) < 0:
        raise ValueError("jpeg lossless: samples exceed precision")
    if not (1 <= predictor <= 7):
        raise ValueError("jpeg lossless: predictor must be 1..7")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    comps = [arr] if gray else [arr[:, :, i] for i in range(arr.shape[2])]
    pt = point_transform
    default = 1 << (precision - pt - 1)

    # pass 1: diffs per component (prediction over the Pt-shifted
    # samples — reconstruction equals them exactly, lossless)
    freqs: dict = {}
    stream: list = []  # (sym, extra, elen) in MCU-interleaved order
    shifted = [(c >> pt).tolist() for c in comps]
    for y in range(h):
        for x in range(w):
            for plane in shifted:
                pred = _jpeg_lossless_predict(
                    plane, y, x, predictor, default
                )
                diff = (plane[y][x] - pred) & 0xFFFF
                if diff >= 32768:
                    if diff == 32768:
                        freqs[16] = freqs.get(16, 0) + 1
                        stream.append((16, 0, 0))
                        continue
                    diff -= 65536
                s = _jpeg_category(diff)
                freqs[s] = freqs.get(s, 0) + 1
                extra = diff if diff >= 0 else diff + (1 << s) - 1
                stream.append((s, extra, s))
    counts, vals = _jpeg_build_table(freqs)
    enc = _jpeg_canonical_codes(counts, vals)[1]
    bw = _JpegBitWriter()
    for sym, extra, elen in stream:
        code, ln = enc[sym]
        bw.write(code, ln)
        if elen:
            bw.write(extra, elen)
    bw.flush()

    ncomp = len(comps)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp
    )
    for ci in range(ncomp):
        out += struct.pack(">BBB", ci + 1, 0x11, 0)  # h=v=1, Tq unused
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), 0x00)
    out += bytes(counts) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack(">BB", ci + 1, 0x00)
    out += bytes([predictor, 0, pt])  # Ss=selector, Se=0, AhAl=Pt
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_decode_scan(
    payload, sos_body, seg_end, comps, huff, dri, coef, prog, geom,
    prec: int = 8,
):
    """Decode ONE entropy-coded scan (baseline sequential or any
    progressive DC/AC first/refinement scan, interleaved or not) into
    the per-component quantized-coefficient store. Returns the file
    position after the scan. Implements T.81 F.2.2 (sequential),
    G.2 (progressive, incl. EOBRUN and the G.1.2.3 AC-refinement
    correction-bit walk); restart segments reset DC predictors and
    EOBRUN. Corrupt-stream category caps follow Tables F.1/F.2:
    DC SSSS ≤ 11 / AC ≤ 10 at 8-bit, ≤ 15 / ≤ 14 at 12-bit."""
    h, w, hmax, vmax, mcx, mcy = geom
    dc_cap, ac_cap = (11, 10) if prec == 8 else (15, 14)
    ns = sos_body[0]
    stabs = []
    for ci in range(ns):
        cid = sos_body[1 + 2 * ci]
        td, ta = sos_body[2 + 2 * ci] >> 4, sos_body[2 + 2 * ci] & 0xF
        stabs.append((cid, td, ta))
    ss, se, ahal = sos_body[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if se > 63 or ss > se:
        raise ValueError("jpeg: bad spectral range")
    segs, endpos = _jpeg_split_scan(payload, seg_end)

    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    scomps = []
    for cid, td, ta in stabs:
        if cid not in cid_to_ci:
            raise ValueError("jpeg: scan names unknown component")
        ci = cid_to_ci[cid]
        _, hh, v, _ = comps[ci]
        dcm = huff.get((0, td))
        acm = huff.get((1, ta))
        if ss == 0 and not (prog and ah) and dcm is None:
            raise ValueError("jpeg: missing DC table")
        if se > 0 and acm is None:
            raise ValueError("jpeg: missing AC table")
        scomps.append((ci, hh, v, dcm, acm))

    interleaved = ns > 1
    if interleaved:
        units = mcx * mcy
    else:
        ci, hh, v, _, _ = scomps[0]
        nbw = -(-(-(-w * hh // hmax)) // 8)
        nbh = -(-(-(-h * v // vmax)) // 8)
        units = nbw * nbh
    per_seg = dri if dri else units
    unit = 0

    def dec_block(bits, ci, by, bx, dcm, acm, preds, state):
        c = coef[ci][by][bx]
        if ss == 0:
            if prog and ah:  # DC refinement: one raw bit
                if bits.bit():
                    c[0] |= 1 << al
            else:
                s = _jpeg_huff_decode(bits, dcm)
                if s > dc_cap:  # T.81 F.1.2.1.2 / Table F.1
                    raise ValueError("jpeg: DC category out of range")
                diff = _jpeg_extend(bits.bits(s), s) if s else 0
                preds[ci] += diff
                if abs(preds[ci]) > 1 << 20:  # corrupt-stream runaway
                    raise ValueError("jpeg: DC predictor out of range")
                c[0] = preds[ci] << al
            if se == 0:
                return
            k = 1
        else:
            k = ss
        if prog and ah:  # AC refinement (G.1.2.3)
            p1, m1 = 1 << al, -1 << al
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                for kk in range(k, se + 1):
                    if c[kk]:
                        if bits.bit() and not (c[kk] & p1):
                            c[kk] += p1 if c[kk] > 0 else m1
                return
            while k <= se:
                rs = _jpeg_huff_decode(bits, acm)
                r, sz = rs >> 4, rs & 0xF
                newval = 0
                if sz == 0:
                    if r < 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += bits.bits(r)
                        break
                    # ZRL: pass over 16 zero-history coefficients
                else:
                    if sz != 1:
                        raise ValueError("jpeg: AC refine size != 1")
                    newval = p1 if bits.bit() else m1
                while k <= se:
                    if c[k]:
                        if bits.bit() and not (c[k] & p1):
                            c[k] += p1 if c[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    c[k] = newval
                k += 1
            for kk in range(k, se + 1):  # EOB correction pass
                if c[kk]:
                    if bits.bit() and not (c[kk] & p1):
                        c[kk] += p1 if c[kk] > 0 else m1
            return
        # sequential AC / progressive AC first scan
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        while k <= se:
            rs = _jpeg_huff_decode(bits, acm)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += bits.bits(r)
                break
            k += r
            if k > se or sz > ac_cap:  # T.81 Table F.2
                raise ValueError("jpeg: AC coefficient out of range")
            c[k] = _jpeg_extend(bits.bits(sz), sz) << al
            k += 1

    for seg in segs:
        if unit >= units:
            break
        bits = _JpegBits(seg)
        preds = [0] * len(comps)
        state = {"eobrun": 0}
        for _ in range(min(per_seg, units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcx)
                for ci, hh, v, dcm, acm in scomps:
                    for by in range(v):
                        for bx in range(hh):
                            dec_block(
                                bits, ci, my * v + by, mx * hh + bx,
                                dcm, acm, preds, state,
                            )
            else:
                ci, hh, v, dcm, acm = scomps[0]
                by, bx = divmod(unit, nbw)
                dec_block(bits, ci, by, bx, dcm, acm, preds, state)
            unit += 1
    if unit < units:
        raise ValueError("jpeg: scan ended early")
    return endpos


def _decode_jpeg(payload: bytes):
    """REAL image decode for baseline-sequential AND progressive
    JFIF/JPEG (r7). Scans — any number, interleaved or per-component,
    spectral-selection and successive-approximation (DC and AC first
    + refinement passes, EOBRUN) — accumulate into a per-component
    quantized-coefficient store; dequant, de-zigzag, and the exact
    float64 IDCT run once at the end, so baseline is just the
    one-scan special case of the same pipeline. 12-bit precision
    (SOF1 extended sequential and 12-bit SOF2, r8) reconstructs at
    full depth — level shift 2048, DC categories to 15 / AC to 14 —
    then drops to the uint8 output contract. LOSSLESS (SOF3, Annex
    H, r8) decodes 2-16-bit predictive scans exactly (no DCT, no
    color transform) and scales onto the same contract. Returns
    (width, height, HxWx3 RGB uint8) or None for anything
    unsupported (arithmetic coding, hierarchical) or corrupt — the
    shared degrade contract."""
    import struct

    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    zz = _jpeg_zz()
    m = _jpeg_dct_mat()
    qts: dict = {}
    huff: dict = {}
    sof = None
    prog = False
    lossless = False
    dri = 0
    saw_scan = False
    pos = 2
    try:
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            pos += 2
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                break
            if pos + 2 > len(payload):
                return None
            (seglen,) = struct.unpack_from(">H", payload, pos)
            seg_end = pos + seglen
            body = payload[pos + 2 : seg_end]
            if marker == 0xDB:  # DQT
                b = 0
                while b < len(body):
                    pq, tq = body[b] >> 4, body[b] & 0xF
                    b += 1
                    if pq:
                        vals = struct.unpack_from(">64H", body, b)
                        b += 128
                    else:
                        vals = list(body[b : b + 64])
                        b += 64
                    if len(vals) < 64:
                        return None
                    qts[tq] = np.asarray(vals, dtype=np.float64)  # zigzag
            elif marker == 0xC4:  # DHT
                b = 0
                while b < len(body):
                    cls, tid = body[b] >> 4, body[b] & 0xF
                    counts = list(body[b + 1 : b + 17])
                    nv = sum(counts)
                    vals = list(body[b + 17 : b + 17 + nv])
                    huff[(cls, tid)] = _jpeg_canonical_codes(counts, vals)[0]
                    b += 17 + nv
            elif marker == 0xC3:  # SOF3 lossless (Huffman, Annex H)
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if not (2 <= prec <= 16) or nc not in (1, 3):
                    return None
                if w == 0 or h == 0:
                    return None
                comps = []
                for ci in range(nc):
                    cid, hv, tq = struct.unpack_from(
                        ">BBB", body, 6 + 3 * ci
                    )
                    if hv != 0x11:  # lossless scope: no subsampling
                        return None
                    comps.append((cid, 1, 1, tq))
                llplanes = [
                    np.zeros((h, w), dtype=np.int64) for _ in comps
                ]
                lossless = True
                prog = False
                sof = (h, w, comps)
            elif marker in (0xC0, 0xC1, 0xC2):
                # SOF0 baseline / SOF1 extended sequential / SOF2
                # progressive (all Huffman). Baseline is 8-bit-only
                # (T.81 Table B.2); SOF1/SOF2 allow 8 or 12.
                prog = marker == 0xC2
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if prec not in (8, 12) or (marker == 0xC0 and prec != 8):
                    return None
                if nc not in (1, 3) or w == 0 or h == 0:
                    return None
                comps = []
                for ci in range(nc):
                    cid, hv, tq = struct.unpack_from(
                        ">BBB", body, 6 + 3 * ci
                    )
                    comps.append((cid, hv >> 4, hv & 0xF, tq))
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if not hmax or not vmax:
                    return None
                mcx = -(-w // (8 * hmax))
                mcy = -(-h // (8 * vmax))
                coef = [
                    np.zeros((mcy * v, mcx * hh, 64), dtype=np.int32)
                    for _, hh, v, _ in comps
                ]
                sof = (h, w, comps)
            elif marker in (
                0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):
                return None  # arithmetic/hierarchical: boundary
            elif marker == 0xDD:  # DRI
                (dri,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                if sof is None:
                    return None
                if lossless:
                    if dri:  # restart intervals: out of lossless scope
                        return None
                    pos = _jpeg_decode_lossless_scan(
                        payload, body, seg_end, sof[2], huff, llplanes,
                        (sof[0], sof[1]), prec,
                    )
                else:
                    pos = _jpeg_decode_scan(
                        payload, body, seg_end, sof[2], huff, dri, coef,
                        prog, (sof[0], sof[1], hmax, vmax, mcx, mcy),
                        prec=prec,
                    )
                saw_scan = True
                continue
            pos = seg_end
        if sof is None or not saw_scan:
            return None
        h, w, comps = sof
        if lossless:
            # samples are carried verbatim (no DQT/IDCT, no YCbCr —
            # T.81 defines no color transform for lossless); scale
            # full-precision values onto the uint8 output contract
            outp = []
            for pl in llplanes:
                if prec > 8:
                    pl = pl >> (prec - 8)
                elif prec < 8:
                    pl = pl << (8 - prec)
                outp.append(np.clip(pl, 0, 255).astype(np.uint8))
            if len(outp) == 1:
                g = outp[0]
                return int(w), int(h), np.stack([g, g, g], axis=2)
            return int(w), int(h), np.stack(outp, axis=2)
        full = []
        for (cid, hh, v, tq), cf in zip(comps, coef):
            if tq not in qts:
                return None
            qt = qts[tq]
            nby, nbx = cf.shape[0], cf.shape[1]
            deq = cf.astype(np.float64) * qt[None, None, :]
            nat = np.zeros_like(deq)
            nat[:, :, zz] = deq
            blocks = nat.reshape(nby, nbx, 8, 8)
            # batched IDCT: pixels = M.T @ F @ M per 8x8 block
            px = np.einsum("ki,yxkl,lj->yxij", m, blocks, m)
            plane = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            ch = -(-h * v // vmax)
            cw = -(-w * hh // hmax)
            half, maxv = 1 << (prec - 1), (1 << prec) - 1
            p = np.clip(np.rint(plane[:ch, :cw] + half), 0, maxv)
            if prec > 8:
                # uint8 output contract: drop the extra sample bits
                # AFTER full-precision reconstruction (chroma centers
                # 2048→128 under the same shift, so the 8-bit YCbCr
                # matrix below stays correct)
                p = np.floor(p / (1 << (prec - 8)))
            if hh != hmax or v != vmax:
                p = p.repeat(vmax // v, axis=0)[:h]
                p = p.repeat(hmax // hh, axis=1)[:, :w]
            full.append(p[:h, :w])
        if len(full) == 1:
            g = full[0].astype(np.uint8)
            return int(w), int(h), np.stack([g, g, g], axis=2)
        return int(w), int(h), _jpeg_rgb_from_ycbcr(*full)
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _gradient_px(width: int, height: int, blue: int, rg_step: int = 16,
                 block: int = 1):
    """The synth family's R/G gradient as raw pixels; ``block`` > 1
    quantizes the ramps to constant NxN blocks (closed-form content
    for DCT codecs: block-constant blocks have a DC-only transform,
    so integer quantization is exact)."""
    import numpy as np

    x = ((np.arange(width) // block) * block * rg_step).clip(0, 255)
    y = ((np.arange(height) // block) * block * rg_step).clip(0, 255)
    px = np.zeros((height, width, 3), dtype=np.uint8)
    px[:, :, 0] = x[None, :].astype(np.uint8)
    px[:, :, 1] = y[:, None].astype(np.uint8)
    px[:, :, 2] = blue & 0xFF
    return px


def synth_jpeg(width: int, height: int, blue: int,
               rg_step: int = 16) -> bytes:
    """The gradient family's JPEG twin: 8x8-block-quantized ramps
    (DC-only blocks ⇒ the all-ones quant table round-trips YCbCr
    exactly; RGB differs only by the ±1-level YCbCr integer rounding,
    which the metrics queries bound)."""
    return _encode_jpeg(_gradient_px(width, height, blue, rg_step, block=8))


_Y4M_MAGIC = b"YUV4MPEG2"


def synth_y4m(
    width: int,
    height: int,
    y_per_frame: list,
    colorspace: str = "C444",
) -> bytes:
    """Deterministic Y4M (yuv4mpeg2) clip: one luma plane value-map
    per frame (an HxW uint8 array or a scalar), neutral chroma
    (U=V=128 ⇒ decoded RGB equals Y exactly under BT.601 — the
    closed-form check). Y4M is an UNCOMPRESSED container — header
    line + raw planar frames — so video decode needs no codec
    library, same as WAV/BMP/PNG."""
    import numpy as np

    assert colorspace in ("C444", "C420")
    header = (
        f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 {colorspace}\n"
    ).encode()
    if colorspace == "C444":
        cw, ch = width, height
    else:
        cw, ch = width // 2, height // 2
    chroma = bytes([128]) * (cw * ch)
    out = [header]
    for y in y_per_frame:
        plane = np.broadcast_to(
            np.asarray(y, dtype=np.uint8), (height, width)
        )
        out.append(b"FRAME\n" + plane.tobytes() + chroma + chroma)
    return b"".join(out)


def _decode_y4m(payload: bytes):
    """REAL video decode for non-interlaced 8-bit Y4M (r6): header
    parse + per-frame planar YUV read + BT.601 full-range conversion
    in numpy. Supports C444, C420 (2x2 nearest upsample), and Cmono.
    Returns (width, height, [HxWx3 RGB uint8 per frame]) or None if
    the payload is not a Y4M this decoder supports."""
    import numpy as np

    if not payload.startswith(_Y4M_MAGIC):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cs = "C420"  # the spec default when no C tag is present
    for tok in payload[len(_Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        # Malformed W/H tokens must degrade to None (the corrupt-
        # input contract), not raise out of the UDF.
        if t.startswith("W"):
            try:
                w = int(t[1:])
            except ValueError:
                return None
        elif t.startswith("H"):
            try:
                h = int(t[1:])
            except ValueError:
                return None
        elif t.startswith("C"):
            cs = t
    if not w or not h or w < 0 or h < 0:
        return None
    if cs.startswith("C444"):
        cw, ch = w, h
    elif cs.startswith("C420"):
        if w % 2 or h % 2:
            # odd-dimension 4:2:0 would make the 2x2 chroma upsample
            # (w-1)/(h-1)-sized and break the Y+chroma arithmetic
            return None
        cw, ch = w // 2, h // 2
    elif cs.startswith("Cmono"):
        cw, ch = 0, 0
    else:
        return None
    frame_bytes = w * h + 2 * cw * ch
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fe = payload.find(b"\n", pos)
        if fe < 0 or not payload[pos:fe].startswith(b"FRAME"):
            return None
        pos = fe + 1
        if pos + frame_bytes > len(payload):
            return None
        y = np.frombuffer(
            payload, np.uint8, count=w * h, offset=pos
        ).reshape(h, w).astype(np.float64)
        if cw:
            u = np.frombuffer(
                payload, np.uint8, count=cw * ch, offset=pos + w * h
            ).reshape(ch, cw).astype(np.float64)
            v = np.frombuffer(
                payload,
                np.uint8,
                count=cw * ch,
                offset=pos + w * h + cw * ch,
            ).reshape(ch, cw).astype(np.float64)
            if cw != w:  # 4:2:0 → nearest 2x2 upsample
                u = u.repeat(2, axis=0)[:h].repeat(2, axis=1)[:, :w]
                v = v.repeat(2, axis=0)[:h].repeat(2, axis=1)[:, :w]
        else:
            u = v = np.full((h, w), 128.0)
        r = y + 1.402 * (v - 128.0)
        g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
        b = y + 1.772 * (u - 128.0)
        rgb = np.clip(
            np.rint(np.stack([r, g, b], axis=2)), 0, 255
        ).astype(np.uint8)
        frames.append(rgb)
        pos += frame_bytes
    if not frames:
        return None
    return w, h, frames


def _decode_avi(payload: bytes):
    """REAL video decode for RIFF/AVI containers carrying UNCOMPRESSED
    24-bit DIB video streams (fccHandler 'DIB '/BI_RGB — the one AVI
    flavor decodable without codec libraries, same honesty rule as
    Y4M): RIFF LIST walk (hdrl → avih dims + strl/strf
    BITMAPINFOHEADER validation, movi → '##db'/'##dc' frame chunks),
    each frame parsed as padded bottom-up BGR rows exactly like
    `_decode_bmp`'s pixel array. Returns (width, height, [HxWx3 RGB
    uint8 per frame]) or None (degrade contract: compressed AVIs are
    unsupported, not faked)."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    try:
        w = h = None
        vid_stream = None  # stream index of the validated DIB strf
        n_strl = 0
        frames = []

        def walk(pos: int, end: int, cur_stream: int | None) -> None:
            # strl LISTs appear in stream order, so the Nth strl IS
            # stream NN — its strf's validation must only license
            # '##db'/'##dc' chunks with the MATCHING two-digit prefix
            # (ADVICE r8: a compressed second stream's '01dc' chunks
            # were decoded as DIB pixels when any strf was 24bpp).
            nonlocal w, h, vid_stream, n_strl
            while pos + 8 <= end:
                cid = payload[pos : pos + 4]
                (sz,) = struct.unpack_from("<I", payload, pos + 4)
                body, bend = pos + 8, pos + 8 + sz
                if bend > len(payload):
                    return
                if cid == b"LIST":
                    ltype = payload[body : body + 4]
                    if ltype == b"strl":
                        s = n_strl
                        n_strl += 1
                        walk(body + 4, bend, s)
                    else:
                        walk(body + 4, bend, cur_stream)
                elif cid == b"avih" and sz >= 40:
                    w, h = struct.unpack_from("<II", payload, body + 32)
                elif cid == b"strf" and sz >= 40 and cur_stream is not None:
                    (bisize, bw, bh, planes, bpp, comp) = struct.unpack_from(
                        "<IiiHHI", payload, body
                    )
                    if bpp == 24 and comp == 0 and vid_stream is None:
                        vid_stream = cur_stream
                elif (
                    cid[2:4] in (b"db", b"dc")
                    and cid[:2].isdigit()
                    and sz > 0
                ):
                    frames.append((cid, body, sz))
                pos = bend + (sz & 1)  # chunks are word-aligned

        walk(12, len(payload), None)
        if not w or not h or vid_stream is None:
            return None
        prefix = b"%02d" % vid_stream
        mine = [f for f in frames if f[0][:2] == prefix]
        # prefer 'db' (explicitly uncompressed) over 'dc' when both
        # appear for the validated stream
        db = [f for f in mine if f[0][2:4] == b"db"]
        picked = db or mine
        if not picked:
            return None
        stride = (w * 3 + 3) & ~3
        out = []
        for _cid, off, sz in picked:
            if sz < stride * h:
                return None
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=off
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            out.append(rows[::-1, :, ::-1].copy())  # bottom-up BGR → RGB
        return int(w), int(h), out
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def synth_avi(width: int, height: int, frames_rgb, fps: int = 25) -> bytes:
    """Minimal valid RIFF/AVI with an uncompressed 24-bit DIB video
    stream: avih + strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)
    + movi of '00db' frames (bottom-up padded BGR, the BMP pixel
    layout). The synth twin for `_decode_avi` — deterministic, no
    codec library."""
    import struct

    import numpy as np

    stride = (width * 3 + 3) & ~3
    dibs = []
    for fr in frames_rgb:
        px = np.asarray(fr, dtype=np.uint8)
        bgr = px[::-1, :, ::-1]  # bottom-up, BGR
        padded = np.zeros((height, stride), dtype=np.uint8)
        padded[:, : width * 3] = bgr.reshape(height, width * 3)
        dibs.append(padded.tobytes())
    frame_sz = stride * height

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_sz * fps, 0, 0x10, len(dibs), 0, 1,
        frame_sz, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(dibs),
            frame_sz, 10000, frame_sz,
        ) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_sz,
        2835, 2835, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(
            b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
        ),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_video_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL video frame sampling (r6): decode the Y4M (or animated
    GIF) container,
    pick ``n_frames`` evenly spaced frames (center-of-bucket rule —
    the same spacing ``sample_frame_offsets`` plans from metadata),
    and emit each as a PNG payload, so the ENTIRE existing image
    path (features / aHash / resize / scene cuts) runs on real
    sampled video frames unchanged. Payloads stay inside the one
    mapInPandas stage; output rows carry a frame-sized PNG each.
    Non-Y4M payloads are skipped (no fake frames — a video stub
    can't masquerade as a decode)."""
    out_schema = (
        f"{id_col} long, frame_idx int, frame_no int, "
        "frame_count int, payload binary"
    )

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                decoded = _decode_y4m(bytes(payload))
                if decoded is None:
                    decoded = _decode_gif(bytes(payload))
                if decoded is None:
                    decoded = _decode_avi(bytes(payload))
                if decoded is None:
                    continue
                _, _, frames = decoded
                n = len(frames)
                for i in range(n_frames):
                    fno = min(((i * 2 + 1) * n) // (2 * n_frames), n - 1)
                    rows.append(
                        (int(mid), i, fno, n, _encode_png(frames[fno]))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "frame_no", "frame_count",
                    "payload",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


def synth_wav(
    freq_hz: float,
    duration_ms: int,
    sample_rate: int = 8000,
    amplitude: float = 0.5,
) -> bytes:
    """Mono 16-bit PCM WAV of a sine tone (stdlib ``wave`` — no
    external codec). Deterministic; used to exercise the REAL decode
    path end to end."""
    import io
    import wave

    import numpy as np

    n = int(sample_rate * duration_ms / 1000)
    t = np.arange(n) / sample_rate
    pcm = (np.sin(2 * np.pi * freq_hz * t) * amplitude * 32767.0).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_wav_segments(segments, sample_rate: int = 8000,
                       frame_samples: int = 80) -> bytes:
    """Mono 16-bit WAV built from (freq_hz|None, n_frames) segments —
    a tone or silence per segment, each an exact multiple of the
    analysis frame, so activity boundaries land ON the frame grid
    and a segmentation oracle can state them in closed form."""
    import io
    import wave

    import numpy as np

    parts = []
    for freq, n_frames in segments:
        n = int(n_frames) * frame_samples
        if freq is None:
            parts.append(np.zeros(n))
        else:
            t = np.arange(n) / sample_rate
            parts.append(np.sin(2 * np.pi * float(freq) * t) * 0.5)
    pcm = (np.concatenate(parts) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def wav_frame_activity(df: DataFrame, id_col: str = "media_id",
                       payload_col: str = "payload",
                       frame_samples: int = 80,
                       threshold: float = 0.1) -> DataFrame:
    """Per-frame voice/tone-activity detection over REAL WAV decode:
    frame the signal (trailing partial frame dropped), RMS per
    frame, active = rms > threshold. Output (id, frame_no, active) —
    3 small columns per 10 ms frame; payloads never leave the UDF.
    Segment stitching (gaps-and-islands) happens downstream in
    native window algebra."""
    out_schema = f"{id_col} long, frame_no int, active boolean"

    def work(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                meta = _decode_wav(bytes(payload))
                if meta is None:
                    continue
                x = meta["signal"]
                n_frames = len(x) // frame_samples
                if n_frames == 0:
                    continue
                frames = x[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                rms = np.sqrt((frames * frames).mean(axis=1))
                for i, r in enumerate(rms):
                    out_rows.append((int(mid), i, bool(r > threshold)))
            yield pd.DataFrame(
                out_rows, columns=[id_col, "frame_no", "active"]
            )

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


# ---------------------------------------------------------------------------
# Compressed audio (r7): REAL decode for the three compressed WAV
# codecs that need no codec library — G.711 u-law (format tag 7),
# G.711 A-law (tag 6), and IMA/DVI ADPCM (tag 0x11) — pure integer
# arithmetic per their specs, vectorized in numpy (G.711) or a
# per-block loop (ADPCM's sample recurrence is inherently serial).
# Encoders are the spec-differential twins AND are cross-checked
# against stdlib audioop (an independent C implementation) in tests.
# Perceptual codecs (MP3/AAC/Vorbis) remain the labeled stub.
# ---------------------------------------------------------------------------

_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _g711_ulaw_decode(codes):
    """u-law byte codes → int16 linear (ITU G.711 expansion)."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int32) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_ulaw_encode(pcm):
    """int16 linear → u-law byte codes. Bit-identical to the Sun
    reference implementation (stdlib audioop's C code): the 16→14-bit
    shift is ARITHMETIC (floor) and happens before negation, which
    differs by one mantissa step on some negative inputs from the
    naive |x|-first formulation — pinned by the audioop differential
    test."""
    import numpy as np

    x14 = np.asarray(pcm, dtype=np.int32) >> 2  # arithmetic shift
    mask = np.where(x14 < 0, 0x7F, 0xFF)
    mag = np.where(x14 < 0, -x14, x14)
    mag = np.minimum(mag, 8159) + 33  # CLIP, BIAS>>2
    # segment = leading-one position above bit 5 (seg_uend search)
    seg = np.maximum(
        np.floor(np.log2(mag)).astype(np.int32) - 5, 0
    )
    uval = (seg << 4) | ((mag >> (seg + 1)) & 0x0F)
    uval = np.where(seg > 7, 0x7F, uval)
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def _g711_alaw_decode(codes):
    """A-law byte codes → int16 linear (ITU G.711 expansion; sign bit
    SET means positive in A-law)."""
    import numpy as np

    a = (np.asarray(codes, dtype=np.uint8).astype(np.int32)) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108,
                 (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def _g711_alaw_encode(pcm):
    """int16 linear → A-law byte codes."""
    import numpy as np

    x = np.asarray(pcm, dtype=np.int32) >> 3  # 13-bit magnitude domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    x = np.where(x >= 0, x, -x - 1)
    x = np.minimum(x, 0xFFF)
    seg = np.maximum((np.floor(np.log2(np.maximum(x, 1)))
                      .astype(np.int32) - 4), 0)
    seg = np.where(x <= 0x1F, 0, seg)
    aval = seg << 4
    low = (x >> 1) & 0x0F           # segments 0-1: shift by 1
    high = (x >> seg) & 0x0F        # segments 2-7: shift by seg
    aval = aval | np.where(seg < 2, low, high)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def _ima_adpcm_decode(data: bytes, block_align: int, channels: int):
    """WAV IMA/DVI ADPCM (format tag 0x11) → int16 mono signal.
    Per-block: 4-byte header per channel (int16 predictor = the first
    sample, step index, reserved), then 4-bit codes LOW NIBBLE FIRST,
    interleaved in 4-byte channel groups for stereo. The sample
    recurrence (predictor feeds the next step) is serial by nature —
    the loop is per block, and blocks are independent."""
    import struct

    import numpy as np

    if block_align < 4 * channels or channels not in (1, 2):
        return None
    out: list = []
    nblocks = len(data) // block_align
    for bi in range(nblocks):
        blk = data[bi * block_align : (bi + 1) * block_align]
        chans: list = []
        ok = True
        for c in range(channels):
            pred, idx, _ = struct.unpack_from("<hBB", blk, 4 * c)
            if idx > 88:
                ok = False
                break
            chans.append([pred, idx, [pred]])
        if not ok:
            return None
        body = blk[4 * channels :]
        # nibbles, low first, in 4-byte per-channel groups. Only
        # COMPLETE groups decode — a truncated tail group would give
        # the channels unequal sample counts (ragged np.mean crash on
        # malformed stereo blocks); degrade by dropping it instead.
        usable = len(body) - (len(body) % (4 * channels))
        for g in range(0, usable, 4 * channels):
            for c in range(channels):
                chunk = body[g + 4 * c : g + 4 * c + 4]
                pred, idx, samples = chans[c]
                for byte in chunk:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _IMA_STEP_TABLE[idx]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        pred = pred - diff if nib & 8 else pred + diff
                        pred = max(-32768, min(32767, pred))
                        idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
                        samples.append(pred)
                chans[c][0], chans[c][1] = pred, idx
        arrs = [np.asarray(s, dtype=np.float64) for _, _, s in chans]
        out.append(np.mean(arrs, axis=0) if channels > 1 else arrs[0])
    if not out:
        return None
    return np.concatenate(out)


def _ima_adpcm_encode(pcm, samples_per_block: int = 505) -> tuple[bytes, int]:
    """int16 mono → WAV IMA ADPCM block stream. Returns (data,
    block_align). Each block stores the first sample verbatim in the
    header and codes the rest as nibbles; the encoder reconstructs
    its own output (decode-in-the-loop) so predictor drift is zero —
    the property the differential test pins."""
    import struct

    import numpy as np

    x = np.asarray(pcm, dtype=np.int64)
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    block_align = 4 + (samples_per_block - 1) // 2
    out = bytearray()
    idx = 0
    for b0 in range(0, len(x), samples_per_block):
        blk = x[b0 : b0 + samples_per_block]
        if len(blk) < samples_per_block:  # zero-pad the tail block
            blk = np.concatenate(
                [blk, np.zeros(samples_per_block - len(blk), dtype=np.int64)]
            )
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles: list[int] = []
        for s in blk[1:]:
            step = _IMA_STEP_TABLE[idx]
            diff = int(s) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            q = 0
            if diff >= step:
                q |= 4
                diff -= step
            if diff >= step >> 1:
                q |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                q |= 1
            nib |= q
            # reconstruct exactly as the decoder will
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
            nibbles.append(nib)
        for i in range(0, len(nibbles), 2):
            out.append(nibbles[i] | (nibbles[i + 1] << 4))
    return bytes(out), block_align


def _riff_chunks(payload: bytes):
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    chunks: dict = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        chunks.setdefault(cid, []).append(payload[pos + 8 : pos + 8 + sz])
        pos += 8 + sz + (sz & 1)
    return chunks


def _decode_wav_compressed(payload: bytes) -> dict | None:
    """REAL decode for compressed-WAV payloads stdlib ``wave``
    rejects: G.711 u-law (tag 7), A-law (tag 6), IMA ADPCM (tag
    0x11). Manual RIFF walk; same metrics dict as the PCM path, or
    None (degrade contract)."""
    import struct

    import numpy as np

    chunks = _riff_chunks(payload)
    if not chunks or b"fmt " not in chunks or b"data" not in chunks:
        return None
    fmt = chunks[b"fmt "][0]
    if len(fmt) < 16:
        return None
    tag, ch, sr, _bps, block_align, _bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    data = chunks[b"data"][0]
    if sr <= 0 or ch not in (1, 2):
        return None
    if tag == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two
        # bytes of the SubFormat GUID (PCM=1, u-law=7, A-law=6)
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if tag == 1:  # PCM widths stdlib wave rejected (e.g. EXTENSIBLE)
        sw = _bits // 8
        x = _pcm_to_float(data, sw)
        if x is None:
            return None
        if ch > 1:
            x = x[: len(x) - (len(x) % ch)].reshape(-1, ch).mean(axis=1)
        return _wav_metrics_from_signal(x, int(sr))
    if tag == 7 or tag == 6:
        codes = np.frombuffer(data, dtype=np.uint8)
        lin = (
            _g711_ulaw_decode(codes) if tag == 7 else _g711_alaw_decode(codes)
        ).astype(np.float64)
        if ch > 1:
            lin = lin[: len(lin) - (len(lin) % ch)].reshape(-1, ch).mean(axis=1)
        x = lin / 32767.0
    elif tag == 0x11:
        sig = _ima_adpcm_decode(data, block_align, ch)
        if sig is None:
            return None
        x = sig / 32767.0
    else:
        return None
    if len(x) <= 1:
        return None
    return _wav_metrics_from_signal(np.clip(x, -1.0, 1.0), int(sr))


def _encode_wav_compressed(pcm, sample_rate: int, codec: str) -> bytes:
    """int16 mono PCM → a compressed RIFF/WAV payload (u-law, A-law,
    or IMA ADPCM) — the synth twin for the compressed decode path."""
    import struct

    import numpy as np

    x = np.asarray(pcm, dtype=np.int16)
    if codec == "ulaw":
        tag, data, block_align, bits = 7, _g711_ulaw_encode(x).tobytes(), 1, 8
    elif codec == "alaw":
        tag, data, block_align, bits = 6, _g711_alaw_encode(x).tobytes(), 1, 8
    elif codec == "ima_adpcm":
        data, block_align = _ima_adpcm_encode(x)
        tag, bits = 0x11, 4
    else:
        raise ValueError(f"unknown codec {codec!r}")
    avg_bps = sample_rate * block_align // (
        1 if codec != "ima_adpcm" else 505
    )
    fmt = struct.pack(
        "<HHIIHH", tag, 1, sample_rate, avg_bps, block_align, bits
    )
    if codec == "ima_adpcm":
        fmt += struct.pack("<HH", 2, 505)  # cbSize, wSamplesPerBlock
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _decode_au(payload: bytes) -> dict | None:
    """REAL decode for Sun/NeXT AU (.snd) audio — the other classic
    uncompressed/G.711 container (big-endian header: magic, data
    offset, data size, encoding, sample rate, channels). Encodings:
    1 = 8-bit u-law, 2 = 8-bit signed PCM, 3 = 16-bit BE PCM,
    27 = 8-bit A-law. Reuses the audioop-verified G.711 kernels."""
    import struct

    import numpy as np

    if len(payload) < 24 or payload[:4] != b".snd":
        return None
    off, size, enc, sr, ch = struct.unpack_from(">IIIII", payload, 4)
    if off < 24 or sr <= 0 or ch not in (1, 2) or off > len(payload):
        return None
    end = min(len(payload), off + size) if size != 0xFFFFFFFF else len(payload)
    data = payload[off:end]
    if enc == 1:
        x = _g711_ulaw_decode(
            np.frombuffer(data, np.uint8)
        ).astype(np.float64) / 32767.0
    elif enc == 27:
        x = _g711_alaw_decode(
            np.frombuffer(data, np.uint8)
        ).astype(np.float64) / 32767.0
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.float64) / 127.0
    elif enc == 3:
        x = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype=">i2"
        ).astype(np.float64) / 32767.0
    else:
        return None
    if ch > 1:
        x = x[: len(x) - (len(x) % ch)].reshape(-1, ch).mean(axis=1)
    if len(x) <= 1:
        return None
    return _wav_metrics_from_signal(np.clip(x, -1.0, 1.0), int(sr))


def _f80_to_float(b: bytes) -> float:
    """IEEE 754 80-bit extended float (the AIFF COMM sample-rate
    field): sign, 15-bit exponent biased 16383, 64-bit mantissa with
    EXPLICIT integer bit. Exponents outside double range (corrupt
    streams; 2**16000 raises OverflowError, the one exception the
    degrade handlers don't classify) return 0.0 — callers reject
    non-positive rates."""
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = (((b[0] & 0x7F) << 8) | b[1]) - 16383
    mant = int.from_bytes(b[2:10], "big")
    if mant == 0 or not (-1100 < exp < 1000):
        return 0.0
    return sign * mant * 2.0 ** (exp - 63)


def _decode_aiff(payload: bytes) -> dict | None:
    """REAL audio decode for AIFF and AIFF-C (r8): big-endian IFF
    chunk walk, COMM (channels, frames, bits, 80-bit-float sample
    rate, AIFC compression fourcc), SSND PCM. Compression types:
    'NONE' (BE PCM at 8/16/24/32 — AIFF 8-bit is SIGNED, unlike
    WAV), 'sowt' (LE16), and G.711 'ulaw'/'alaw' (upper/lowercase)
    via the audioop-verified kernels. Same metrics dict as WAV, or
    None (degrade contract). Validated on CPython's real pluck-*
    recordings against their WAV twins."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"FORM":
        return None
    form = payload[8:12]
    if form not in (b"AIFF", b"AIFC"):
        return None
    try:
        ch = nframes = bits = None
        sr = None
        comp = b"NONE"
        data = None
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (sz,) = struct.unpack_from(">I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + sz]
            if len(body) < sz:
                return None
            if cid == b"COMM" and sz >= 18:
                ch, nframes, bits = struct.unpack_from(">HIH", body, 0)
                sr = _f80_to_float(body[8:18])
                if form == b"AIFC" and sz >= 22:
                    comp = body[18:22]
            elif cid == b"SSND" and sz >= 8:
                (off,) = struct.unpack_from(">I", body, 0)
                data = body[8 + off :]
            pos += 8 + sz + (sz & 1)
        if not ch or ch not in (1, 2) or not sr or sr <= 0 or data is None:
            return None
        comp = comp.lower()
        if comp in (b"ulaw", b"alaw"):
            codes = np.frombuffer(data, dtype=np.uint8)
            lin = (
                _g711_ulaw_decode(codes)
                if comp == b"ulaw"
                else _g711_alaw_decode(codes)
            ).astype(np.float64)
            x = lin / 32767.0
        elif comp in (b"none", b"sowt"):
            sw = bits // 8
            if sw not in (1, 2, 3, 4):
                return None
            if comp == b"sowt":  # little-endian 16-bit AIFC variant
                if sw != 2:
                    return None
                x = np.frombuffer(
                    data[: len(data) - (len(data) % 2)], dtype="<i2"
                ).astype(np.float64) / 32767.0
            elif sw == 1:  # AIFF 8-bit PCM is SIGNED
                x = np.frombuffer(data, dtype=np.int8).astype(
                    np.float64
                ) / 127.0
            elif sw == 2:
                x = np.frombuffer(
                    data[: len(data) - (len(data) % 2)], dtype=">i2"
                ).astype(np.float64) / 32767.0
            else:  # 24/32-bit big-endian assembly
                usable = len(data) - (len(data) % sw)
                raw = np.frombuffer(
                    data, dtype=np.uint8, count=usable
                ).reshape(-1, sw).astype(np.int64)
                v = raw[:, 0]
                for k in range(1, sw):
                    v = (v << 8) | raw[:, k]
                half = 1 << (8 * sw - 1)
                v = np.where(v >= half, v - (half << 1), v)
                x = v.astype(np.float64) / float(half - 1)
        else:
            return None  # compressed AIFC (ima4...) — honest boundary
        if ch > 1:
            x = x[: len(x) - (len(x) % ch)].reshape(-1, ch).mean(axis=1)
        if len(x) <= 1:
            return None
        return _wav_metrics_from_signal(np.clip(x, -1.0, 1.0), int(sr))
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _decode_wav(payload: bytes) -> dict | None:
    """REAL audio decode for RIFF/WAV payloads: stdlib ``wave`` parses
    the container, numpy computes signal metrics — no fake anywhere on
    this path. Returns None for non-WAV/unsupported payloads (callers
    fall back to the labeled stub).

    Metrics: sample_rate, n_frames, duration_ms, rms (of the [-1,1]
    signal), zcr_hz (zero crossings per second), centroid_hz
    (magnitude-spectrum centroid), band_energy[4] (energy fraction in
    4 equal bands up to Nyquist).
    """
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(n)
    except Exception:
        # stdlib wave handles RIFF PCM only; try the compressed-WAV
        # path (G.711 u-law/A-law, IMA ADPCM, EXTENSIBLE), then FLAC
        # and Sun AU, before giving up. The whole chain sits under
        # the module's degrade contract: a corrupt payload returns
        # None, it never raises out of the UDF.
        try:
            return (
                _decode_wav_compressed(payload)
                or _decode_flac(payload)
                or _decode_au(payload)
                or _decode_aiff(payload)
            )
        except Exception:
            return None
    if sr <= 0 or n <= 1:
        return None
    x = _pcm_to_float(raw, sw)
    if x is None:
        return None
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return _wav_metrics_from_signal(x, sr)


def _pcm_to_float(raw: bytes, sw: int):
    """Raw PCM bytes at sample width ``sw`` ∈ {1,2,3,4} bytes →
    [-1, 1] float64 (8-bit WAV PCM is UNSIGNED with a 128 offset;
    the wider widths are signed little-endian)."""
    import numpy as np

    if sw == 1:
        return (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 127.0
    if sw == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: len(b) - (len(b) % 3)].reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float64) / float((1 << 23) - 1)
    if sw == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(
            (1 << 31) - 1
        )
    return None


def _wav_metrics_from_signal(x, sr: int) -> dict | None:
    """Signal metrics over a [-1, 1] float64 mono signal — shared by
    the PCM and compressed decode paths."""
    import numpy as np

    n = len(x)
    if sr <= 0 or n <= 1:
        return None
    rms = float(np.sqrt(np.mean(x * x)))
    crossings = int(np.count_nonzero(np.diff(np.signbit(x))))
    zcr_hz = crossings * sr / (n - 1) / 2.0  # full cycles per s
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    power = spec * spec
    total = float(power.sum())
    centroid_hz = float((power * freqs).sum() / total) if total > 0 else 0.0
    edges = np.linspace(0, sr / 2, 5)
    bands = [
        float(power[(freqs >= lo) & (freqs < hi)].sum() / total)
        if total > 0
        else 0.0
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    return {
        "sample_rate": sr,
        "n_frames": n,
        "duration_ms": int(n * 1000 // sr),
        "rms": rms,
        "zcr_hz": zcr_hz,
        "centroid_hz": centroid_hz,
        "band_energy": bands,
        "signal": x,  # [-1,1] float64 samples (frame-level consumers)
    }


# ---------------------------------------------------------------------------
# FLAC (r7): REAL lossless-audio codec — pure integer arithmetic per
# the FLAC format spec, stdlib + numpy. Decoder: fLaC magic +
# metadata walk (STREAMINFO), frame sync with CRC-8-verified headers
# and CRC-16-verified frames, UTF-8 coded frame numbers, all four
# channel assignments (independent, left/side, right/side, mid/side),
# all subframe types (CONSTANT, VERBATIM, FIXED 0-4, LPC 1-32 with
# quantized coefficients), wasted bits, partitioned Rice/Rice2
# residuals with raw-bits escapes — and verifies the decoded PCM
# against STREAMINFO's MD5, so a correct-looking-but-wrong decode
# cannot pass. Encoder (the differential twin): frame split, per-
# subframe best-of CONSTANT/VERBATIM/FIXED (or spec-exercising LPC),
# single-partition Rice with escape, stereo decorrelation modes, real
# CRCs and real MD5. Losslessness makes the differential EXACT:
# decode(encode(pcm)) == pcm bit-for-bit, any waveform.
# ---------------------------------------------------------------------------


def _crc8_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_flac(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _FlacBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


class _FlacBits:
    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.d = data
        self.pos = pos_bits

    def bit(self) -> int:
        if self.pos >= len(self.d) * 8:
            raise ValueError("flac: truncated bitstream")
        v = (self.d[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sbits(self, k: int) -> int:
        v = self.bits(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        q = 0
        while self.bit() == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("flac: runaway unary")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _flac_utf8_encode(n: int) -> bytes:
    """Canonical (shortest-form) UTF-8-style coded number — an
    n-byte sequence carries (7-n) + 6(n-1) payload bits."""
    if n < 0x80:
        return bytes([n])
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead | (n >> (6 * (nbytes - 1)))]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _flac_utf8_decode(bits: _FlacBits) -> int:
    b0 = bits.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("flac: bad utf8 coded number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = bits.bits(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


_FLAC_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _flac_rice_write(bw: _FlacBitWriter, res, k: int) -> None:
    for r in res:
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1  # zigzag
        q, rem = z >> k, z & ((1 << k) - 1)
        bw.write_unary(q)
        if k:
            bw.write(rem, k)


def _flac_rice_cost(res, k: int) -> int:
    c = 0
    for r in res:
        z = (r << 1) if r >= 0 else ((-r) << 1) - 1
        c += (z >> k) + 1 + k
    return c


def _flac_write_residual(bw: _FlacBitWriter, res) -> None:
    """Single-partition Rice (method 0, partition order 0) with the
    raw-bits escape when Rice would blow up."""
    res = [int(r) for r in res]
    best_k, best_c = 0, None
    for k in range(15):
        c = _flac_rice_cost(res, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
    maxbits = max((abs(r).bit_length() + 1 for r in res), default=1)
    if best_c > (maxbits * len(res)) and maxbits <= 31:
        bw.write(0, 2)  # method: 4-bit rice
        bw.write(0, 4)  # partition order 0
        bw.write(15, 4)  # escape
        bw.write(maxbits, 5)
        for r in res:
            bw.write(r & ((1 << maxbits) - 1), maxbits)
        return
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(best_k, 4)
    _flac_rice_write(bw, res, best_k)


def _flac_read_residual(bits: _FlacBits, block: int, order: int) -> list:
    method = bits.bits(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    plen = 4 if method == 0 else 5
    porder = bits.bits(4)
    nparts = 1 << porder
    if block % nparts:
        raise ValueError("flac: block size not divisible by partitions")
    res: list[int] = []
    for p in range(nparts):
        n = (block >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: bad partition size")
        k = bits.bits(plen)
        if k == (1 << plen) - 1:  # escape: raw
            raw = bits.bits(5)
            for _ in range(n):
                v = bits.bits(raw) if raw else 0
                if raw and v >> (raw - 1):
                    v -= 1 << raw
                res.append(v)
        else:
            for _ in range(n):
                q = bits.unary()
                z = (q << k) | (bits.bits(k) if k else 0)
                res.append((z >> 1) ^ -(z & 1))
    return res


def _flac_pack_samples(arrs, bps: int) -> bytes:
    """Interleaved little-endian signed sample bytes at the stream's
    bit depth — the byte string FLAC's STREAMINFO MD5 covers."""
    import numpy as np

    nch = len(arrs)
    if nch == 2:
        inter = np.empty(len(arrs[0]) * 2, dtype=np.int64)
        inter[0::2], inter[1::2] = arrs[0], arrs[1]
    else:
        inter = np.asarray(arrs[0], dtype=np.int64)
    if bps == 8:
        return inter.astype(np.int8).tobytes()
    if bps == 16:
        return inter.astype("<i2").tobytes()
    if bps == 24:
        b4 = inter.astype("<i4").tobytes()
        out = bytearray(len(inter) * 3)
        out[0::3] = b4[0::4]
        out[1::3] = b4[1::4]
        out[2::3] = b4[2::4]
        return bytes(out)
    raise ValueError(f"unsupported bps {bps}")


def _flac_encode(pcm, sample_rate: int = 8000, block_size: int = 4096,
                 stereo_mode: str = "auto", force_lpc: bool = False,
                 bps: int = 16) -> bytes:
    """FLAC encoder twin: signed-int mono (1-D) or stereo (Nx2) numpy
    array at ``bps`` ∈ {8, 16, 24} → a spec-conformant FLAC stream
    with real CRC-8/CRC-16 and a real STREAMINFO MD5 of the
    decoded-signal bytes. Subframes pick
    the cheapest of CONSTANT / FIXED order 0-4 (per true Rice cost) /
    VERBATIM; ``force_lpc`` instead writes the order-2 fixed
    predictor THROUGH the LPC subframe format (coefs [2,-1], shift 0)
    to exercise the decoder's LPC path differentially. Stereo modes:
    independent, left_side, right_side, mid_side, or auto (cheapest
    per frame)."""
    import hashlib
    import struct

    import numpy as np

    if bps not in (8, 16, 24):
        raise ValueError("flac encoder supports bps 8/16/24")
    x = np.asarray(pcm, dtype=np.int64)
    stereo = x.ndim == 2
    nch = 2 if stereo else 1
    nsamples = x.shape[0]

    md5 = hashlib.md5()
    md5.update(
        _flac_pack_samples(
            [x[:, 0], x[:, 1]] if stereo else [x], bps
        )
    )

    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # 20 bits sr | 3 bits ch-1 | 5 bits bps-1 | 36 bits total
    packed = (sample_rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | nsamples
    si += packed.to_bytes(8, "big")
    si += md5.digest()
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si  # last-block flag

    def write_subframe(bw: _FlacBitWriter, sig, sub_bps: int) -> None:
        sig = [int(v) for v in sig]
        if all(v == sig[0] for v in sig):
            bw.write(0, 1)
            bw.write(0b000000, 6)
            bw.write(0, 1)
            bw.write(sig[0] & ((1 << sub_bps) - 1), sub_bps)
            return
        best = None  # (cost, order)
        for order, coefs in _FLAC_FIXED_COEFS.items():
            if order >= len(sig):
                continue
            res = []
            for i in range(order, len(sig)):
                pred = sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
                res.append(sig[i] - pred)
            cost = min(_flac_rice_cost(res, k) for k in range(15)) if res else 0
            cost += order * sub_bps
            if best is None or cost < best[0]:
                best = (cost, order, res)
        if best is None or best[0] > len(sig) * sub_bps:
            bw.write(0, 1)
            bw.write(0b000001, 6)  # VERBATIM
            bw.write(0, 1)
            for v in sig:
                bw.write(v & ((1 << sub_bps) - 1), sub_bps)
            return
        _, order, res = best
        if force_lpc and len(sig) > 2:
            coefs = [2, -1]
            res = [
                sig[i] - (2 * sig[i - 1] - sig[i - 2])
                for i in range(2, len(sig))
            ]
            bw.write(0, 1)
            bw.write(0b100000 | (2 - 1), 6)  # LPC order 2
            bw.write(0, 1)
            for i in range(2):
                bw.write(sig[i] & ((1 << sub_bps) - 1), sub_bps)
            bw.write(15 - 1, 4)  # coefficient precision 15 bits
            bw.write(0, 5)  # shift 0
            for c in coefs:
                bw.write(c & 0x7FFF, 15)
            _flac_write_residual(bw, res)
            return
        bw.write(0, 1)
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for i in range(order):
            bw.write(sig[i] & ((1 << sub_bps) - 1), sub_bps)
        _flac_write_residual(bw, res)

    frame_idx = 0
    for f0 in range(0, nsamples, block_size):
        blk = x[f0 : f0 + block_size]
        bs = blk.shape[0]
        if stereo:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            costs = {
                "independent": int(np.abs(np.diff(left)).sum()
                                   + np.abs(np.diff(right)).sum()),
                "left_side": int(np.abs(np.diff(left)).sum()
                                 + np.abs(np.diff(side)).sum()),
                "right_side": int(np.abs(np.diff(side)).sum()
                                  + np.abs(np.diff(right)).sum()),
                "mid_side": int(np.abs(np.diff(mid)).sum()
                                + np.abs(np.diff(side)).sum()),
            }
            mode = (
                min(costs, key=costs.get)
                if stereo_mode == "auto"
                else stereo_mode
            )
            chan_assign = {
                "independent": 0b0001,
                "left_side": 0b1000,
                "right_side": 0b1001,
                "mid_side": 0b1010,
            }[mode]
            subs = {
                "independent": [(left, 0), (right, 0)],
                "left_side": [(left, 0), (side, 1)],
                "right_side": [(side, 1), (right, 0)],
                "mid_side": [(mid, 0), (side, 1)],
            }[mode]
        else:
            chan_assign = 0b0000
            subs = [(blk, 0)]

        hdr = _FlacBitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy (frame number coded)
        hdr.write(0b0111, 4)  # blocksize: 16-bit escape
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_assign, 4)
        hdr.write({8: 0b001, 16: 0b100, 24: 0b110}[bps], 3)
        hdr.write(0, 1)  # reserved
        hdr.align()
        hb = bytes(hdr.buf) + _flac_utf8_encode(frame_idx) + struct.pack(
            ">H", bs - 1
        )
        hb += bytes([_crc8_flac(hb)])

        bw = _FlacBitWriter()
        for sig, extra in subs:
            # the side channel carries one extra bit of range
            write_subframe(bw, sig, bps + extra)
        bw.align()
        frame = hb + bytes(bw.buf)
        frame += struct.pack(">H", _crc16_flac(frame))
        out += frame
        frame_idx += 1
    return bytes(out)


def _decode_flac(payload: bytes):
    """REAL FLAC decode → dict(sample_rate, signal [-1,1] mono
    float64, n_frames, ...) via the shared metrics path, or None
    (degrade contract). Verifies frame-header CRC-8, frame CRC-16,
    and — when STREAMINFO carries one — the MD5 of the decoded PCM,
    so a plausible-but-wrong decode cannot return."""
    import hashlib
    import struct

    import numpy as np

    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    try:
        pos = 4
        sr = nch = bps = total = None
        md5_want = None
        while pos + 4 <= len(payload):
            hdr = payload[pos]
            btype = hdr & 0x7F
            last = hdr & 0x80
            blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + blen]
            if len(body) < blen:
                return None
            if btype == 0:  # STREAMINFO
                if blen < 34:
                    return None
                packed = int.from_bytes(body[10:18], "big")
                sr = packed >> 44
                nch = ((packed >> 41) & 0x7) + 1
                bps = ((packed >> 36) & 0x1F) + 1
                total = packed & ((1 << 36) - 1)
                md5_want = body[18:34]
            pos += 4 + blen
            if last:
                break
        if sr is None or not sr or nch not in (1, 2) or bps not in (8, 16, 24):
            return None

        chans: list[list[int]] = [[] for _ in range(nch)]
        while pos < len(payload):
            # resync: look for the 14-bit sync at a byte boundary
            if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
                return None
            fb = _FlacBits(payload, pos * 8)
            fb.bits(14)
            if fb.bit():
                return None
            fb.bit()  # blocking strategy
            bs_code = fb.bits(4)
            sr_code = fb.bits(4)
            ca = fb.bits(4)
            bps_code = fb.bits(3)
            fb.bit()
            _flac_utf8_decode(fb)
            if bs_code == 0 or bs_code in (None,):
                return None
            if bs_code == 1:
                bs = 192
            elif 2 <= bs_code <= 5:
                bs = 576 << (bs_code - 2)
            elif bs_code == 6:
                bs = fb.bits(8) + 1
            elif bs_code == 7:
                bs = fb.bits(16) + 1
            else:
                bs = 256 << (bs_code - 8)
            if sr_code == 12:
                fb.bits(8)
            elif sr_code in (13, 14):
                fb.bits(16)
            elif sr_code == 15:
                return None
            fbps = {
                0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32,
            }.get(bps_code)
            if fbps is None:
                return None
            fb.align()
            hdr_len = (fb.pos // 8) - pos
            crc8 = fb.bits(8)
            if _crc8_flac(payload[pos : pos + hdr_len]) != crc8:
                return None
            if ca <= 7:
                sub_specs = [(fbps, 0)] * (ca + 1)
                if ca + 1 != nch:
                    return None
            elif ca == 8:  # left/side
                sub_specs = [(fbps, 0), (fbps, 1)]
            elif ca == 9:  # right/side
                sub_specs = [(fbps, 1), (fbps, 0)]
            elif ca == 10:  # mid/side
                sub_specs = [(fbps, 0), (fbps, 1)]
            else:
                return None

            decoded = []
            for base_bps, extra in sub_specs:
                sub_bps = base_bps + extra
                if fb.bit():
                    return None
                stype = fb.bits(6)
                wasted = 0
                if fb.bit():
                    wasted = fb.unary() + 1
                eff = sub_bps - wasted
                if stype == 0:  # CONSTANT
                    v = fb.bits(eff)
                    if v >> (eff - 1):
                        v -= 1 << eff
                    sig = [v] * bs
                elif stype == 1:  # VERBATIM
                    sig = [fb.sbits(eff) for _ in range(bs)]
                elif 8 <= stype <= 12:  # FIXED
                    order = stype - 8
                    warm = [fb.sbits(eff) for _ in range(order)]
                    res = _flac_read_residual(fb, bs, order)
                    sig = list(warm)
                    coefs = _FLAC_FIXED_COEFS[order]
                    for i in range(order, bs):
                        pred = sum(
                            c * sig[i - 1 - j] for j, c in enumerate(coefs)
                        )
                        sig.append(res[i - order] + pred)
                elif stype >= 32:  # LPC
                    order = stype - 31
                    warm = [fb.sbits(eff) for _ in range(order)]
                    prec = fb.bits(4) + 1
                    if prec == 16:
                        return None
                    shift = fb.bits(5)
                    coefs = [fb.sbits(prec) for _ in range(order)]
                    res = _flac_read_residual(fb, bs, order)
                    sig = list(warm)
                    for i in range(order, bs):
                        acc = sum(
                            c * sig[i - 1 - j] for j, c in enumerate(coefs)
                        )
                        sig.append(res[i - order] + (acc >> shift))
                else:
                    return None
                if wasted:
                    sig = [v << wasted for v in sig]
                decoded.append(sig)
            fb.align()
            frame_len = fb.pos // 8 - pos
            crc16 = fb.bits(16)
            if _crc16_flac(payload[pos : pos + frame_len]) != crc16:
                return None
            pos += frame_len + 2

            if ca == 8:  # left/side -> right = left - side
                left = decoded[0]
                side = decoded[1]
                decoded = [left, [l - s for l, s in zip(left, side)]]
            elif ca == 9:  # right/side -> left = right + side
                side = decoded[0]
                right = decoded[1]
                decoded = [[r + s for r, s in zip(right, side)], right]
            elif ca == 10:  # mid/side: L=((2m|s&1)+s)/2, R=((2m|s&1)-s)/2
                mid = decoded[0]
                side = decoded[1]
                left = [(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
                right = [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]
                decoded = [left, right]
            for c in range(nch):
                chans[c].extend(decoded[c])
            if total and len(chans[0]) >= total:
                break

        if not chans[0]:
            return None
        arrs = [np.asarray(c, dtype=np.int64) for c in chans]
        if total:
            arrs = [a[:total] for a in arrs]
        if md5_want and md5_want != b"\x00" * 16:
            md5 = hashlib.md5()
            md5.update(_flac_pack_samples(arrs, bps))
            if md5.digest() != md5_want:
                return None
        mono = (
            np.mean(arrs, axis=0) if nch > 1 else arrs[0].astype(np.float64)
        )
        scale = float(1 << (bps - 1)) - 1.0
        metrics = _wav_metrics_from_signal(
            np.clip(mono / scale, -1.0, 1.0), int(sr)
        )
        if metrics is None:
            # <=1-sample streams (bs_code 6 allows 1-sample frames)
            # have no metrics; a partial dict would KeyError in
            # callers that index metrics keys — degrade to None.
            return None
        return {
            "sample_rate": int(sr),
            "channels": nch,
            "bits_per_sample": bps,
            "pcm": arrs,
            **metrics,
        }
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _decode_audio_features(payload: bytes, n: int = 8) -> list[float]:
    """Audio summary vector: REAL for WAV payloads (rms, zcr,
    spectral centroid, 4-band energy split, duration — computed from
    decoded PCM); deterministic fake for payloads this container
    cannot decode (no ffmpeg/librosa for compressed formats)."""
    m = _decode_wav(payload)
    if m is not None:
        nyq = m["sample_rate"] / 2.0
        feats = [
            m["rms"],
            m["zcr_hz"] / nyq,
            m["centroid_hz"] / nyq,
            *m["band_energy"],
            m["n_frames"] / m["sample_rate"],  # duration seconds
        ]
        return feats[:n] + [0.0] * max(0, n - len(feats))
    return _stable_floats(payload, n, salt=b"audio")


def extract_wav_metrics(df: DataFrame, id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """REAL WAV decode → typed metric columns (no fake path: non-WAV
    rows are dropped). Output: (id, sample_rate int, n_frames long,
    duration_ms long, rms double, zcr_hz double, centroid_hz double).

    Same scale shape as the featurizers: the payload dies inside the
    UDF; only ~50 bytes/row of metrics continue."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_frames long, "
        "duration_ms long, rms double, zcr_hz double, centroid_hz double"
    )

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                m = _decode_wav(bytes(p))
                if m is None:
                    continue
                rows.append((
                    mid, m["sample_rate"], m["n_frames"], m["duration_ms"],
                    m["rms"], m["zcr_hz"], m["centroid_hz"],
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_frames", "duration_ms",
                         "rms", "zcr_hz", "centroid_hz"],
            )

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


def extract_audio_features(df: DataFrame, id_col: str = "media_id",
                           payload_col: str = "payload") -> DataFrame:
    out_schema = f"{id_col} long, features array<double>"

    def featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = [
                (mid, _decode_audio_features(bytes(p)))
                for mid, p in zip(pdf[id_col], pdf[payload_col])
                if p is not None
            ]
            yield pd.DataFrame(rows, columns=[id_col, "features"])

    return df.select(id_col, payload_col).mapInPandas(featurize, out_schema)


def resize_images(df: DataFrame, target_w: int, target_h: int,
                  id_col: str = "media_id",
                  payload_col: str = "payload") -> DataFrame:
    """Resize: payload → resized payload + updated metadata.

    REAL for uncompressed 24-bit BMP: decode (``_decode_bmp``),
    nearest-neighbor resample via numpy index maps, re-encode
    (``_encode_bmp``) — an actual image out, mime ``image/bmp``.
    STUBBED for formats needing codecs (no PIL/ffmpeg in container):
    the "resized" payload is a deterministic sha256 chain over the
    original bytes + target dims, mime ``image/raw``. Both paths
    exercise the same Spark contract — Arrow batches in, binary
    column out, metadata struct rebuilt.
    """
    out_schema = (
        f"{id_col} long, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
    )

    def _fake_bytes(payload: bytes, n: int) -> bytes:
        out = bytearray()
        counter = 0
        seed = payload + target_w.to_bytes(4, "big") + target_h.to_bytes(4, "big")
        while len(out) < n:
            out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
            counter += 1
        return bytes(out[:n])

    def _resize_real(payload: bytes) -> tuple[bytes, str] | None:
        decoded = _decode_rgb(payload)
        if decoded is None:
            return None
        import numpy as np

        w, h, px = decoded
        xi = (np.arange(target_w) * w) // target_w
        yi = (np.arange(target_h) * h) // target_h
        resized = px[yi][:, xi]
        if payload[:8] == _PNG_SIG:  # re-encode in the source format
            return _encode_png(resized), "image/png"
        return _encode_bmp(resized), "image/bmp"

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                real = _resize_real(bytes(payload))
                if real is not None:
                    out, mime = real
                else:
                    out, mime = (
                        _fake_bytes(
                            bytes(payload),
                            max(32, (target_w * target_h) // 64),
                        ),
                        "image/raw",
                    )
                rows.append((
                    mid, out,
                    {"mime": mime, "width": target_w,
                     "height": target_h, "duration_ms": None},
                ))
            yield pd.DataFrame(rows, columns=[id_col, "payload", "meta"])

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


def _wav_spectrogram(
    payload: bytes, n_fft: int = 256, hop: int = 128, n_bands: int = 8
) -> tuple[int, list[list[float]]] | None:
    """REAL time-resolved STFT band energies for a WAV payload:
    Hann-windowed frames of ``n_fft`` samples every ``hop``, each
    frame's power spectrum folded into ``n_bands`` equal bands up to
    Nyquist and normalized to fractions. Returns (n_windows, rows) or
    None for non-WAV payloads — same honesty contract as
    `_decode_wav` (compressed codecs need ffmpeg; not in scope)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(n)
    except Exception:
        return None
    if sw != 2 or sr <= 0 or n < n_fft:
        return None
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    win = np.hanning(n_fft)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    edges = np.linspace(0, sr / 2, n_bands + 1)
    edges[-1] = np.inf  # Nyquist bin belongs to the last band
    rows: list[list[float]] = []
    for start in range(0, len(x) - n_fft + 1, hop):
        spec = np.abs(np.fft.rfft(x[start : start + n_fft] * win))
        power = spec * spec
        total = float(power.sum())
        rows.append(
            [
                float(power[(freqs >= lo) & (freqs < hi)].sum() / total)
                if total > 0
                else 0.0
                for lo, hi in zip(edges[:-1], edges[1:])
            ]
        )
    return len(rows), rows


def extract_wav_spectrograms(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
) -> DataFrame:
    """Time×frequency training features: (id, sample_rate, n_windows,
    spectrogram array<array<double>>) — the STFT band-energy matrix
    audio models consume, computed by the REAL decode path (non-WAV
    rows are dropped, like `extract_wav_metrics`).

    Scale shape: Arrow-batched mapInPandas, payloads die inside the
    task; the output is n_windows×n_bands doubles per row — bounded
    by duration, independent of payload encoding. No shuffle."""
    out_schema = (
        f"{id_col} long, sample_rate int, n_windows int, "
        "spectrogram array<array<double>>"
    )

    def work(batches: Iterator) -> Iterator:
        import io
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                got = _wav_spectrogram(bytes(p), n_fft, hop, n_bands)
                if got is None:
                    continue
                with wave.open(io.BytesIO(bytes(p)), "rb") as w:
                    sr = w.getframerate()
                nw, mat = got
                rows.append((mid, sr, nw, mat))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_windows", "spectrogram"],
            )

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)


# ---------------------------------------------------------------------------
# Unified media catalog probe (r8): HEADER-ONLY metadata extraction
# across every container this module knows — the cataloging entry
# point a 100 TB media lake needs before deciding what to decode.
# Each prober reads headers/structure only (IHDR, SOF, fmt, STREAMINFO,
# avih, moov boxes...), never pixel or PCM payloads, so probing cost
# is O(bytes examined) ≈ O(KB) per object regardless of media size.
# MP4/ISO-BMFF is METADATA-ONLY by design: the box tree (brand, mvhd
# duration, per-track handler + sample-entry fourcc) is parseable
# without codecs; its STREAMS are not decodable here (honest
# boundary, like compressed AVI).
# ---------------------------------------------------------------------------


def _probe_mp4(payload: bytes):
    """ISO-BMFF (MP4/MOV) box walk: major brand from ftyp, movie
    duration from mvhd (version 0 and 1 layouts), per-track handler
    types from hdlr and codec fourccs from stsd. No stream decode."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    try:
        brand = payload[8:12].decode("latin1")
        duration_ms = None
        tracks: list[str] = []
        codecs: list[str] = []

        def walk(pos: int, end: int) -> None:
            nonlocal duration_ms
            while pos + 8 <= end:
                (sz,) = struct.unpack_from(">I", payload, pos)
                btype = payload[pos + 4 : pos + 8]
                hdr = 8
                if sz == 1:
                    if pos + 16 > end:
                        return
                    (sz,) = struct.unpack_from(">Q", payload, pos + 8)
                    hdr = 16
                elif sz == 0:
                    sz = end - pos
                if sz < hdr or pos + sz > end:
                    return
                body = pos + hdr
                if btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                    walk(body, pos + sz)
                elif btype == b"mvhd" and sz >= hdr + 20:
                    ver = payload[body]
                    if ver == 1 and sz >= hdr + 28:
                        ts, dur = struct.unpack_from(
                            ">IQ", payload, body + 20
                        )
                    else:
                        ts, dur = struct.unpack_from(
                            ">II", payload, body + 12
                        )
                    if ts:
                        duration_ms = int(dur * 1000 // ts)
                elif btype == b"hdlr" and sz >= hdr + 12:
                    tracks.append(
                        payload[body + 8 : body + 12].decode("latin1")
                    )
                elif btype == b"stsd" and sz >= hdr + 16:
                    codecs.append(
                        payload[body + 12 : body + 16].decode("latin1")
                    )
                pos += sz

        walk(0, len(payload))
        return {
            "mime": "video/mp4",
            "container": f"mp4/{brand}",
            "duration_ms": duration_ms,
            "codec": ",".join(codecs) or None,
            "n_streams": len(tracks) or None,
        }
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def _probe_media(payload: bytes) -> dict | None:
    """Sniff + header-parse one payload. Returns a metadata dict
    (mime, container, width, height, duration_ms, codec, n_frames,
    sample_rate, channels, bits, n_streams — absent keys = unknown)
    or None for unrecognized/corrupt payloads (degrade contract)."""
    import struct

    try:
        if payload[:2] == b"BM" and len(payload) >= 30:
            _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
            if comp != 0 or w <= 0:
                return None
            return {
                "mime": "image/bmp", "container": "bmp",
                "width": int(w), "height": abs(int(h)),
                "codec": "rgb", "bits": int(bpp),
            }
        if payload[:8] == _PNG_SIG and len(payload) >= 29:
            if payload[12:16] != b"IHDR":
                return None
            w, h = struct.unpack_from(">II", payload, 16)
            depth, ctype = payload[24], payload[25]
            return {
                "mime": "image/png", "container": "png",
                "width": int(w), "height": int(h),
                "codec": {0: "gray", 2: "rgb", 3: "palette", 4: "gray+a",
                          6: "rgba"}.get(ctype, f"ctype{ctype}"),
                "bits": int(depth),
            }
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 13:
            w, h = struct.unpack_from("<HH", payload, 6)
            # frame count: walk block structure (no LZW decode)
            n = 0
            pos = 13
            if payload[10] & 0x80:
                pos += 3 * (2 << (payload[10] & 7))
            while pos < len(payload):
                b = payload[pos]
                if b == 0x3B:
                    break
                if b == 0x21:  # extension: label + sub-blocks
                    pos += 2
                    while pos < len(payload) and payload[pos]:
                        pos += payload[pos] + 1
                    pos += 1
                elif b == 0x2C:  # image descriptor
                    n += 1
                    flags = payload[pos + 9]
                    pos += 10
                    if flags & 0x80:
                        pos += 3 * (2 << (flags & 7))
                    pos += 1  # LZW min code size
                    while pos < len(payload) and payload[pos]:
                        pos += payload[pos] + 1
                    pos += 1
                else:
                    return None
            return {
                "mime": "image/gif", "container": "gif",
                "width": int(w), "height": int(h),
                "codec": "lzw", "n_frames": n or None,
            }
        if payload[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    return None
                marker = payload[pos + 1]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                    prec, h, w, nc = struct.unpack_from(
                        ">BHHB", payload, pos + 4
                    )
                    mode = {0xC0: "baseline", 0xC1: "extended",
                            0xC2: "progressive", 0xC3: "lossless"}[marker]
                    return {
                        "mime": "image/jpeg", "container": "jpeg",
                        "width": int(w), "height": int(h),
                        "codec": mode, "bits": int(prec),
                        "n_streams": int(nc),
                    }
                if marker in (0xC9, 0xCA, 0xCB):
                    return {"mime": "image/jpeg", "container": "jpeg",
                            "codec": "arithmetic"}
                if marker == 0xD9 or marker == 0xDA:
                    return None  # scan before any SOF: corrupt
                (sz,) = struct.unpack_from(">H", payload, pos + 2)
                pos += 2 + sz
            return None
        if payload[:2] in (b"II", b"MM") and len(payload) >= 8:
            bo = "<" if payload[:2] == b"II" else ">"
            magic, ifd = struct.unpack_from(bo + "HI", payload, 2)
            if magic != 42:
                return None
            (n_ent,) = struct.unpack_from(bo + "H", payload, ifd)
            w = h = comp = bits = None
            for i in range(n_ent):
                tag, typ, cnt, raw = struct.unpack_from(
                    bo + "HHII", payload, ifd + 2 + 12 * i
                )
                if typ == 3 and cnt == 1:
                    (raw,) = struct.unpack_from(
                        bo + "H", payload, ifd + 10 + 12 * i
                    )
                if tag == 256:
                    w = raw
                elif tag == 257:
                    h = raw
                elif tag == 259:
                    comp = raw
                elif tag == 258 and cnt == 1:
                    bits = raw
            if not w or not h:
                return None
            return {
                "mime": "image/tiff", "container": "tiff",
                "width": int(w), "height": int(h),
                "codec": {1: "none", 5: "lzw", 7: "jpeg",
                          32773: "packbits"}.get(comp, f"comp{comp}"),
                "bits": int(bits) if bits else None,
            }
        if payload[:4] == b"\x00\x00\x01\x00" and len(payload) >= 22:
            cnt = struct.unpack_from("<H", payload, 4)[0]
            if not (1 <= cnt <= 64):
                return None
            best_w = best_h = 0
            for i in range(min(cnt, (len(payload) - 6) // 16)):
                w8, h8 = payload[6 + 16 * i], payload[7 + 16 * i]
                w0, h0 = w8 or 256, h8 or 256
                if w0 * h0 > best_w * best_h:
                    best_w, best_h = w0, h0
            return {
                "mime": "image/x-icon", "container": "ico",
                "width": best_w, "height": best_h,
                "n_frames": int(cnt),
            }
        if (
            payload[:1] == b"P"
            and len(payload) > 2
            and payload[1] in b"123456"
            and payload[2] in b" \t\r\n#"
        ):
            # header-only (ADVICE r8): tokenizing magic/w/h/maxval
            # costs O(header bytes); a full _decode_netpbm would parse
            # every ASCII sample, breaking the catalog's O(KB) contract
            hdr = _netpbm_header(payload)
            if hdr is None:
                return None
            kind, w, h, _maxval, _pos = hdr
            return {
                "mime": "image/x-portable-"
                + {1: "bitmap", 4: "bitmap", 2: "graymap", 5: "graymap",
                   3: "pixmap", 6: "pixmap"}[kind],
                "container": f"pnm/p{kind}",
                "width": int(w), "height": int(h),
                "codec": "ascii" if kind <= 3 else "binary",
            }
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            # metadata-only (VP8 streams are honestly undecodable
            # here): dims from the first VP8X/VP8L/VP8 chunk
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                (sz,) = struct.unpack_from("<I", payload, pos + 4)
                body = payload[pos + 8 : pos + 8 + sz]
                if cid == b"VP8X" and sz >= 10:
                    w = 1 + int.from_bytes(body[4:7], "little")
                    h = 1 + int.from_bytes(body[7:10], "little")
                    return {"mime": "image/webp", "container": "webp",
                            "width": w, "height": h, "codec": "vp8x"}
                if cid == b"VP8L" and sz >= 5 and body[0] == 0x2F:
                    bits = int.from_bytes(body[1:5], "little")
                    return {"mime": "image/webp", "container": "webp",
                            "width": (bits & 0x3FFF) + 1,
                            "height": ((bits >> 14) & 0x3FFF) + 1,
                            "codec": "vp8l"}
                if cid == b"VP8 " and sz >= 10:
                    # lossy keyframe: 3-byte frame tag, 3-byte sync,
                    # then 14-bit dims
                    if body[3:6] == b"\x9d\x01\x2a":
                        w = int.from_bytes(body[6:8], "little") & 0x3FFF
                        h = int.from_bytes(body[8:10], "little") & 0x3FFF
                        return {"mime": "image/webp",
                                "container": "webp", "width": w,
                                "height": h, "codec": "vp8"}
                    return {"mime": "image/webp", "container": "webp",
                            "codec": "vp8"}
                pos += 8 + sz + (sz & 1)
            return {"mime": "image/webp", "container": "webp"}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            chunks = _riff_chunks(payload)
            if not chunks or b"fmt " not in chunks:
                return None
            fmt = chunks[b"fmt "][0]
            tag, ch, sr, _bps, block_align, bits = struct.unpack_from(
                "<HHIIHH", fmt, 0
            )
            if tag == 0xFFFE and len(fmt) >= 26:
                (tag,) = struct.unpack_from("<H", fmt, 24)
            data = chunks.get(b"data", [b""])[0]
            codec = {1: "pcm", 6: "alaw", 7: "ulaw",
                     0x11: "ima_adpcm"}.get(tag, f"tag{tag}")
            dur = None
            if sr and tag == 1 and bits and ch:
                dur = int(len(data) * 1000 // (sr * ch * (bits // 8 or 1)))
            elif sr and ch and tag in (6, 7):
                # ch check (ADVICE r8): a corrupt fmt chunk with
                # channels=0 must degrade, not ZeroDivisionError
                dur = int(len(data) * 1000 // (sr * ch))
            return {
                "mime": "audio/wav", "container": "riff/wave",
                "codec": codec, "sample_rate": int(sr),
                "channels": int(ch), "bits": int(bits) or None,
                "duration_ms": dur,
            }
        if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                (sz,) = struct.unpack_from(">I", payload, pos + 4)
                body = payload[pos + 8 : pos + 8 + sz]
                if cid == b"COMM" and sz >= 18:
                    ch, nframes, bits = struct.unpack_from(">HIH", body, 0)
                    sr = _f80_to_float(body[8:18])
                    comp = (
                        body[18:22].decode("latin1").strip().lower()
                        if payload[8:12] == b"AIFC" and sz >= 22
                        else "pcm"
                    )
                    # int(sr) >= 1 (ADVICE r8): _f80_to_float can
                    # return 0 < sr < 1, so sr > 0 still divides by 0
                    dur = (
                        int(nframes * 1000 // int(sr))
                        if int(sr) >= 1
                        else None
                    )
                    return {
                        "mime": "audio/aiff",
                        "container": payload[8:12].decode().lower(),
                        "codec": "pcm" if comp == "none" else comp,
                        "sample_rate": int(sr) if sr > 0 else None,
                        "channels": int(ch), "bits": int(bits) or None,
                        "duration_ms": dur, "n_frames": int(nframes),
                    }
                pos += 8 + sz + (sz & 1)
            return None
        if payload[:4] == b".snd" and len(payload) >= 24:
            off, size, enc, sr, ch = struct.unpack_from(">IIIII", payload, 4)
            codec = {1: "ulaw", 2: "pcm8", 3: "pcm16", 27: "alaw"}.get(
                enc, f"enc{enc}"
            )
            nbytes = min(len(payload) - off, size) if off < len(
                payload
            ) else 0
            per = 2 if enc == 3 else 1
            dur = (
                int(nbytes * 1000 // (sr * ch * per)) if sr and ch else None
            )
            return {
                "mime": "audio/basic", "container": "au",
                "codec": codec, "sample_rate": int(sr),
                "channels": int(ch), "duration_ms": dur,
            }
        if payload[:4] == b"fLaC" and len(payload) >= 42:
            packed = int.from_bytes(payload[18:26], "big")
            sr = packed >> 44
            nch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            dur = int(total * 1000 // sr) if sr and total else None
            return {
                "mime": "audio/flac", "container": "flac",
                "codec": "flac", "sample_rate": int(sr),
                "channels": int(nch), "bits": int(bps),
                "duration_ms": dur,
            }
        if payload.startswith(_Y4M_MAGIC):
            nl = payload.find(b"\n")
            if nl < 0:
                return None
            w = h = None
            cs = "C420"
            fps = None
            for tok in payload[len(_Y4M_MAGIC): nl].split():
                t = tok.decode("ascii", "replace")
                if t.startswith("W"):
                    w = int(t[1:])
                elif t.startswith("H"):
                    h = int(t[1:])
                elif t.startswith("C"):
                    cs = t
                elif t.startswith("F") and ":" in t:
                    num, den = t[1:].split(":")
                    fps = int(num) / int(den) if int(den) else None
            if not w or not h:
                return None
            cw, chh = (
                (w, h) if cs.startswith("C444")
                else (0, 0) if cs.startswith("Cmono")
                else (w // 2, h // 2)
            )
            fb = w * h + 2 * cw * chh
            # frame count from size arithmetic (FRAME\n + planes)
            n = max(0, (len(payload) - nl - 1) // (6 + fb))
            dur = int(n * 1000 / fps) if fps and n else None
            return {
                "mime": "video/x-yuv4mpeg", "container": "y4m",
                "width": int(w), "height": int(h), "codec": cs.lower(),
                "n_frames": n or None, "duration_ms": dur,
            }
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            import struct as _s

            w = h = nfr = usec = None
            ok24 = False

            def walk(pos, end):
                nonlocal w, h, nfr, usec, ok24
                while pos + 8 <= end:
                    cid = payload[pos:pos + 4]
                    (sz,) = _s.unpack_from("<I", payload, pos + 4)
                    body, bend = pos + 8, pos + 8 + sz
                    if bend > len(payload):
                        return
                    if cid == b"LIST" and payload[body:body + 4] != b"movi":
                        walk(body + 4, bend)
                    elif cid == b"avih" and sz >= 40:
                        usec, = _s.unpack_from("<I", payload, body)
                        nfr, = _s.unpack_from("<I", payload, body + 16)
                        w, h = _s.unpack_from("<II", payload, body + 32)
                    elif cid == b"strf" and sz >= 40:
                        _, _, _, _, bpp, comp = _s.unpack_from(
                            "<IiiHHI", payload, body
                        )
                        ok24 = bpp == 24 and comp == 0
                    pos = bend + (sz & 1)

            walk(12, len(payload))
            if not w or not h:
                return None
            return {
                "mime": "video/x-msvideo", "container": "avi",
                "width": int(w), "height": int(h),
                "codec": "rgb24" if ok24 else "compressed",
                "n_frames": int(nfr) if nfr else None,
                "duration_ms": int(nfr * usec // 1000)
                if nfr and usec else None,
            }
        return _probe_mp4(payload)
    except (ValueError, IndexError, OverflowError, ZeroDivisionError,
            struct.error):
        return None


def probe_media_metadata(df: DataFrame, id_col: str = "media_id",
                         payload_col: str = "payload") -> DataFrame:
    """Catalog probe over a binary media column: sniff the container
    and HEADER-PARSE its typed metadata — mime, container, dims,
    duration, codec, frame/stream counts, sample rate/channels/bits —
    without decoding pixels or PCM (O(KB) examined per object, so the
    catalog pass over a 100 TB lake costs header reads, not decode).
    Unrecognized/corrupt payloads yield mime 'unknown' (kept, not
    dropped — a catalog must account for every object).

    Scale shape: one mapInPandas stage; payloads die inside the UDF,
    ~100-byte metadata rows continue."""
    out_schema = (
        f"{id_col} long, mime string, container string, "
        "width int, height int, duration_ms long, codec string, "
        "n_frames int, sample_rate int, channels int, bits int, "
        "n_streams int"
    )
    cols = ["mime", "container", "width", "height", "duration_ms",
            "codec", "n_frames", "sample_rate", "channels", "bits",
            "n_streams"]

    def work(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                meta = _probe_media(bytes(payload)) or {"mime": "unknown"}
                rows.append(
                    (int(mid), *[meta.get(c) for c in cols])
                )
            yield pd.DataFrame(rows, columns=[id_col, *cols])

    return df.select(id_col, payload_col).mapInPandas(work, out_schema)
