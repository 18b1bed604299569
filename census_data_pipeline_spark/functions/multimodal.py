"""Multimodal column plumbing (SURVEY.md §2.11 ⊕; north-star requirement).

Image/audio/video payloads are opaque ``BinaryType`` columns + typed
metadata structs. The Spark-side plumbing — schema, partitioning, Arrow
batch shape through ``mapInPandas`` — is real and tested, and so is image
decode for BMP, PNG (incl. palette, 16-bit, Adam7) and baseline JPEG via
stdlib+numpy (``decode_image``) and WAV/PCM audio (``decode_wav``);
remaining formats (progressive JPEG, compressed audio, video codecs)
stay behind a clearly-marked
NotImplementedError with a deterministic fake used by tests — the
documented no-PIL/ffmpeg container limit.

Scale: payloads stay columnar in parquet; feature extraction is an
embarrassingly parallel ``mapInPandas`` over Arrow batches (no shuffle),
with ``spark.sql.files.maxPartitionBytes`` sizing the batch working set.
``spark.read.format("binaryFile")`` is the ingestion path for loose media
files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = (
    "doc_id long, payload binary, media_type string, byte_len long, checksum string"
)

FEATURE_SCHEMA = "doc_id long, byte_len long, mean_byte double, n_zero long"


def ingest_binary_files(spark, path: str, glob: str | None = None) -> DataFrame:
    """Loose-media ingestion via ``spark.read.format("binaryFile")``
    (SURVEY.md §2.11): one row per file with (path, modificationTime,
    length, content), normalized to the engine's payload shape. Partition
    parallelism follows file count/size; at scale, pack small media files
    into parquet first (this reader is for raw landing zones)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("path").alias("source_path"),
        F.col("content").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.col("length").cast("long").alias("byte_len"),
        F.sha2(F.col("content"), 256).alias("checksum"),
    )


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the canonical multimodal row shape (payload + media_type + byte_len +
    checksum)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("checksum"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(payload: bytes) -> object:
    """Decode an image payload to an HWC uint8 numpy array.

    Stdlib-only decoders (no PIL/opencv in this container) — the specs
    are fully expressible with ``struct`` + ``zlib`` + numpy:

    - **BMP**: uncompressed BI_RGB, 24/32-bit, top-down or bottom-up.
    - **PNG**: 8/16-bit gray/RGB/RGBA + 1/2/4/8-bit palette and packed
      gray (PLTE lookup / MSB-first unpack, gray scaled to full range),
      16-bit high-byte downsampled, linear or
      Adam7-interlaced, all five scanline filters (None/Sub/Up/Average/
      Paeth, PNG spec §9; interlace passes unfilter independently).
    - **JPEG**: baseline sequential (SOF0, 8-bit, huffman), gray or
      YCbCr at any sampling factors (4:4:4/4:2:2/4:2:0), byte stuffing,
      DRI restart markers; JFIF YCbCr->RGB.
    - **GIF**: 87a/89a first frame — variable-width LSB-first LZW,
      global/local palettes, interlaced or linear row order; extensions
      (GCE transparency, comments) skipped, output opaque RGB.
      Animation frames beyond the first are the frame-sampling tier's
      job (decode_video_frames).

    Anything else (progressive JPEG, sub-8-bit Adam7, ...) raises
    NotImplementedError — that gate is the documented container limit,
    and callers (resize_images) fall back to the deterministic fake so
    row counts never depend on payload decodability."""
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    raise NotImplementedError(
        "only BMP (24/32-bit BI_RGB), PNG (8-bit, linear or Adam7), "
        "baseline JPEG and GIF (LZW, first frame) have stdlib decoders; "
        "other formats need an imaging library (PIL/opencv) not "
        "available in this container"
    )


def _decode_bmp(payload: bytes) -> object:
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (bpp * width + 31) // 32 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * nch]
    px = rows.reshape(height, width, nch)
    if bottom_up:
        px = px[::-1]
    # BGR(A) storage order -> RGB(A)
    out = px[..., [2, 1, 0] + ([3] if nch == 4 else [])]
    return np.ascontiguousarray(out)


def _decode_png(payload: bytes) -> object:
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_id, comp, filt, interlace = ihdr
    # color type 3 (palette, r4): scanlines carry one index byte per
    # pixel; output is the RGB PLTE lookup
    channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype_id)
    ok_depth = (
        depth == 8
        or (depth == 16 and ctype_id != 3)
        or (depth in (1, 2, 4) and ctype_id in (0, 3))  # packed gray/palette
    )
    if not ok_depth or channels is None or comp != 0 or filt != 0 \
            or interlace not in (0, 1):
        raise NotImplementedError(
            "only 1/2/4/8/16-bit PNG color types 0/2/3/6 supported "
            f"(depth={depth}, color_type={ctype_id}, interlace={interlace})"
        )
    if depth in (1, 2, 4) and interlace == 1:
        raise NotImplementedError(
            "sub-8-bit Adam7 PNG unsupported (per-pass bit packing)"
        )
    # 16-bit samples are big-endian; after unfiltering we keep the high
    # byte (the standard 16->8 downsample). Filters operate on BYTES with
    # the left neighbor max(1, bpp) bytes back (PNG spec 9.2) — for
    # sub-8-bit depths pixels are MSB-first bit-packed and the left
    # distance is one byte; samples unpack AFTER unfiltering.
    sample_bytes = depth // 8
    bpp = max(1, channels * sample_bytes)
    palette = None
    if ctype_id == 3:
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("palette PNG missing or malformed PLTE")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    # bound BEFORE decompressing: untrusted scraped payloads can declare
    # huge dims or carry a decompression bomb; 2^26 output bytes (64 MB)
    # per image is far above any sane training-data thumbnail
    stride = (width * channels * depth + 7) // 8
    if interlace == 0:
        expected = height * (stride + 1)
    else:  # Adam7: per-pass sub-images, each row filtered independently
        expected = sum(
            ph * (pw * bpp + 1)
            for pw, ph in _adam7_sizes(width, height)
            if pw > 0 and ph > 0
        )
    if width <= 0 or height <= 0 or height * (stride + 1) > (1 << 26):
        raise ValueError(
            f"PNG dimensions out of supported bounds ({width}x{height}x{channels})"
        )
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected or dec.unconsumed_tail:
        # wrong size OR a bomb still holding back output past the cap
        raise ValueError("PNG decompressed size mismatch")
    if interlace == 0:
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
        rows = _unfilter_scanlines(arr, stride, bpp)
        if depth in (1, 2, 4):
            # MSB-first unpack to one byte per pixel, trim row padding
            unpacked = np.unpackbits(rows, axis=1)
            px = unpacked.reshape(height, -1, depth)
            weights = 1 << np.arange(depth - 1, -1, -1)
            vals = (px * weights).sum(axis=2).astype(np.uint8)[:, :width]
            if ctype_id == 0:  # gray: scale to full 8-bit range
                vals = (vals.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
            out = vals.reshape(height, width, 1)
        else:
            out = rows.reshape(height, width, bpp)
    else:
        out = np.zeros((height, width, bpp), dtype=np.uint8)
        off = 0
        for (pw, ph), (x0, y0, dx, dy) in zip(
            _adam7_sizes(width, height), _ADAM7
        ):
            if pw <= 0 or ph <= 0:
                continue
            pstride = pw * bpp
            n = ph * (pstride + 1)
            sub = np.frombuffer(
                raw[off : off + n], dtype=np.uint8
            ).reshape(ph, pstride + 1)
            off += n
            px = _unfilter_scanlines(sub, pstride, bpp).reshape(
                ph, pw, bpp
            )
            out[y0::dy, x0::dx] = px
    if sample_bytes == 2:
        out = np.ascontiguousarray(out[:, :, ::2])  # big-endian high byte
    if palette is not None:
        idx = out.reshape(height, width)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of PLTE range")
        return palette[idx].copy()  # (H, W, 3) RGB lookup
    return out.copy()


# Adam7 pass origins and strides: (x0, y0, dx, dy), PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _adam7_sizes(width: int, height: int) -> list[tuple[int, int]]:
    return [
        ((width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in _ADAM7
    ]


def _unfilter_scanlines(arr: "object", stride: int, bpp: int) -> "object":
    """Reverse PNG scanline filtering over a (rows, stride+1) uint8 array
    (leading filter byte per row); returns (rows, stride) uint8. ``bpp``
    is the filter's left-neighbor distance in BYTES (channels x
    bytes-per-sample, PNG spec 9.2) — byte lanes are independent mod 256,
    so the same code covers 8- and 16-bit depths. Sub/Up are
    numpy-vectorized (cumsum mod 256 / vector add); Average/Paeth are
    inherently sequential (reconstructed-left dependency)."""
    import numpy as np

    rows = arr.shape[0]
    out = np.zeros((rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(rows):
        ftype = int(arr[y, 0])
        cur = arr[y, 1:].astype(np.int32)
        if ftype == 0:
            res = cur
        elif ftype == 1:  # Sub — per-channel-lane prefix sum mod 256:
            # recon[p] = Σ raw[0..p] (mod 256), so one cumsum vectorizes
            # the whole scanline (addition mod 256 is associative)
            res = (
                np.cumsum(cur.reshape(-1, bpp), axis=0, dtype=np.int64)
                .reshape(-1) & 0xFF
            )
        elif ftype == 2:  # Up — plain vector add with the previous row
            res = (cur + prev) & 0xFF
        elif ftype == 3:  # Average — left-neighbor dependency with a
            # non-associative //2: inherently sequential per scanline
            cl, pl, res_l = cur.tolist(), prev.tolist(), []
            for i in range(stride):
                left = res_l[i - bpp] if i >= bpp else 0
                res_l.append((cl[i] + (left + pl[i]) // 2) & 0xFF)
            res = np.array(res_l, dtype=np.int32)
        elif ftype == 4:  # Paeth — sequential (predictor is branchy on
            # the reconstructed left neighbor)
            cl, pl, res_l = cur.tolist(), prev.tolist(), []
            for i in range(stride):
                a = res_l[i - bpp] if i >= bpp else 0
                b = pl[i]
                c = pl[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                res_l.append((cl[i] + pred) & 0xFF)
            res = np.array(res_l, dtype=np.int32)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = res
        prev = res
    return out


# JPEG natural order: zigzag index -> (row-major) position, ITU-T.81 fig 5
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            c = math.sqrt(0.5) if u == 0 else 1.0
            m[x, u] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    byte-stuffing removal and RSTn marker skipping."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: skip, reset run
                self.pos += 1
                self.bits = 0
                self.nbits = 0
                self._fill()
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def byte_align_reset(self) -> None:
        self.bits = 0
        self.nbits = 0


def _huff_decode(reader: "_BitReader", lut: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read(1)
        length += 1
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG huffman code")


def _extend(v: int, t: int) -> int:
    # ITU-T.81 F.2.2.1: map t raw bits to the signed coefficient value
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_jpeg(payload: bytes) -> object:
    """Baseline sequential JPEG (SOF0, huffman, 8-bit) decoder: marker
    parse -> per-MCU huffman DC/AC decode -> dequant -> IDCT (matrix
    form) -> nearest-neighbor chroma upsample -> JFIF YCbCr->RGB.
    Supports gray and 3-component color at any sampling factors (4:4:4 /
    4:2:2 / 4:2:0), byte stuffing, and DRI restart markers. Progressive
    (SOF2), arithmetic coding, and 12-bit precision stay gated behind
    NotImplementedError."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = np.frombuffer(
                    seg[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                qt[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                counts = seg[off + 1 : off + 17]
                off += 17
                lut, code = {}, 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        lut[(ln, code)] = seg[off]
                        off += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = lut
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0); got SOF{marker & 0xF}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel[cs] = (tables >> 4, tables & 0xF)
            return _jpeg_scan(
                payload, pos + seglen, frame, scan_sel, qt, huff,
                restart_interval,
            )
        elif marker == 0xD9:  # EOI before any scan
            break
        pos += seglen
    raise ValueError("JPEG has no scan data")


def _jpeg_scan(payload, start, frame, scan_sel, qt, huff, restart_interval):
    import numpy as np

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w <= 0 or h <= 0 or w * h > (1 << 24):  # bomb guard, as PNG
        raise ValueError(f"JPEG dimensions out of supported bounds ({w}x{h})")
    if len(comps) not in (1, 3):
        raise NotImplementedError("only gray or YCbCr JPEG supported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    m = _idct_matrix()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(payload, start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.byte_align_reset()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                dc_lut = huff[(0, scan_sel[c["id"]][0])]
                ac_lut = huff[(1, scan_sel[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(reader, dc_lut)
                        diff = _extend(reader.read(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(reader, ac_lut)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("JPEG AC run past block end")
                            coef[_ZIGZAG[kk]] = _extend(reader.read(s), s)
                            kk += 1
                        block = coef.reshape(8, 8) * q
                        px = m @ block @ m.T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    # upsample each plane to full MCU-grid resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out[..., None].copy()
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list:
    """GIF-variant LZW: variable-width codes packed LSB-FIRST (unlike
    PNG/JPEG bitstreams), clear/end codes at 2^mcs and 2^mcs+1, code
    width grows when the dictionary fills 2^width (cap 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    next_code = end + 1
    out: list = []
    acc = 0
    nbits = 0
    prev: tuple | None = None
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError("invalid GIF LZW first code")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + (entry[0],)
            next_code += 1
        elif code == next_code:
            entry = prev + (prev[0],)
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("invalid GIF LZW code")
        out.extend(entry)
        prev = entry
        if next_code >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


# GIF interlace passes: (first row, row step), in order
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_iter_frames(payload: bytes):
    """Walk a GIF87a/89a block stream, yielding per-frame decode state:
    ``(left, top, pal, flat, disposal, transparent)`` with ``flat`` the
    h×w palette-index array (interlace already undone), plus the Graphic
    Control Extension fields that govern composition (disposal method
    bits 2-4; transparent index or None). Returns (screen_w, screen_h,
    global_palette, bg_index) via StopIteration value — use
    ``_gif_screen`` for that header tuple instead when not iterating."""
    import struct as _struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed = _struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
        pos += 3 * n
    if not (0 < sw <= 8192 and 0 < sh <= 8192):
        raise ValueError(f"GIF dimensions out of supported bounds ({sw}x{sh})")
    disposal, transparent = 0, None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:  # Graphic Control
                flags = payload[pos + 1]
                disposal = (flags >> 2) & 0x07
                transparent = payload[pos + 4] if flags & 0x01 else None
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = _struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _gif_lzw_decode(b"".join(chunks), mcs, w * h)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data short")
        flat = np.array(idx, dtype=np.int64).reshape(h, w)
        if flat.max() >= len(pal):
            raise ValueError("GIF index out of palette range")
        if ipacked & 0x40:  # interlaced: reorder rows into place
            ordered = np.empty_like(flat)
            src = 0
            for first, step in _GIF_INTERLACE:
                for row in range(first, h, step):
                    ordered[row] = flat[src]
                    src += 1
            flat = ordered
        yield (left, top, pal, flat, disposal, transparent)
        disposal, transparent = 0, None  # GCE governs ONE image


def _gif_screen(payload: bytes) -> tuple:
    """(screen_w, screen_h, global_palette_or_None, bg_index)."""
    import struct as _struct

    import numpy as np

    sw, sh, packed = _struct.unpack_from("<HHB", payload, 6)
    bg = payload[11]
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, 13).reshape(-1, 3)
    return sw, sh, gct, bg


def _decode_gif(payload: bytes) -> object:
    """First frame of a GIF87a/89a to an HWC uint8 RGB array."""
    import numpy as np

    for left, top, pal, flat, _disp, _tr in _gif_iter_frames(payload):
        return np.ascontiguousarray(pal[flat])
    raise ValueError("GIF has no image descriptor")


def decode_gif_composited(payload: bytes) -> list:
    """ALL frames of a GIF87a/89a as full-canvas HWC uint8 RGB arrays,
    composited the way a renderer draws them — closes the r4
    partial-frame gap (VERDICT r4 #7): a frame smaller than the screen
    or offset from (0,0) is drawn onto the ACCUMULATED canvas, not
    decoded in isolation.

    Per the GIF89a spec's Graphic Control Extension:
    - pixels equal to the transparent index are not drawn (the canvas
      shows through),
    - after a frame is emitted, its disposal method runs: 0/1 leave the
      canvas as drawn; 2 restores the frame's RECTANGLE to the
      background color; 3 restores the rectangle to the canvas as it
      was BEFORE this frame,
    - the initial canvas is the screen filled with the header background
      color (via the global palette; black without one).

    Returns a list of (screen_h, screen_w, 3) uint8 arrays, one per
    image descriptor, in stream order."""
    import numpy as np

    sw, sh, gct, bg = _gif_screen(payload)
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list = []
    for left, top, pal, flat, disposal, transparent in _gif_iter_frames(
        payload
    ):
        h, w = flat.shape
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame exceeds the logical screen")
        region = canvas[top:top + h, left:left + w]
        before = region.copy() if disposal == 3 else None
        rgb = pal[flat]
        if transparent is not None:
            mask = flat != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            region[:] = bg_rgb
        elif disposal == 3:
            region[:] = before
    if not frames:
        raise ValueError("GIF has no image descriptor")
    return frames


def decode_wav(payload: bytes) -> tuple[object, int]:
    """Decode a RIFF/WAVE PCM payload to (samples, sample_rate) — samples
    as float64 in [-1, 1], shape (n_frames, n_channels). Stdlib-only
    (struct + numpy): 8-bit unsigned, 16-bit and 32-bit signed PCM
    (format tag 1) are supported; compressed formats (float, ADPCM,
    mp3-in-wav) raise NotImplementedError, malformed payloads ValueError
    — both fall into callers' deterministic-fake gates."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"only PCM WAV supported (format tag {tag})")
    if channels < 1 or rate <= 0:
        raise ValueError("malformed WAV fmt chunk")
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        samples = (raw - 128.0) / 128.0
    elif bits == 16:
        raw = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 32:
        raw = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
        samples = raw.astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV bit depth {bits}")
    frames = samples[: len(samples) // channels * channels]
    return frames.reshape(-1, channels), rate


def audio_features(samples: object, rate: int) -> dict:
    """Deterministic per-clip audio statistics over decoded PCM
    (channel-averaged): frame count, duration, RMS, peak, zero-crossing
    count — the feature-extraction stage a training-data pipeline runs
    before filtering/balancing an audio corpus."""
    import numpy as np

    mono = np.asarray(samples, dtype=np.float64).mean(axis=1)
    nf = int(mono.shape[0])
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "n_frames": nf,
        "duration_s": nf / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(mono**2))) if nf else 0.0,
        "peak": float(np.max(np.abs(mono))) if nf else 0.0,
        "zero_crossings": zc,
    }


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction over binary WAV payloads:
    decode_wav -> audio_features per row; undecodable payloads get the
    deterministic byte-stat fake (n_frames = byte_len, rms/peak from the
    byte mean) so the operator is total — same contract as resize_images.
    1 row in -> 1 row out; no shuffle; Arrow-batched."""
    out_schema = (
        "doc_id long, n_frames long, duration_s double, rms double, "
        "peak double, zero_crossings long, decoded boolean"
    )
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    _decode, _feats = decode_wav, audio_features

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct as _struct

        import pandas as _pd

        def one(b: bytes) -> tuple:
            try:
                samples, rate = _decode(bytes(b))
                f = _feats(samples, rate)
                return (f["n_frames"], f["duration_s"], f["rms"], f["peak"],
                        f["zero_crossings"], True)
            except (NotImplementedError, ValueError, IndexError, _struct.error):
                nb = len(b)
                mean = (float(sum(b)) / nb / 255.0) if nb else 0.0
                return (nb, 0.0, mean, mean, 0, False)

        for batch in batches:
            rows = [one(b) for b in batch["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "n_frames": [r[0] for r in rows],
                    "duration_s": [r[1] for r in rows],
                    "rms": [r[2] for r in rows],
                    "peak": [r[3] for r in rows],
                    "zero_crossings": [r[4] for r in rows],
                    "decoded": [r[5] for r in rows],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=out_schema)


def encode_bmp(pixels: object) -> bytes:
    """Encode an HWC uint8 array (1/3/4 channels) as an uncompressed
    24-bit bottom-up BMP — the deterministic stdlib re-encode target for
    resize_images (alpha is dropped, gray is replicated to RGB)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nch = px.shape
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    rgb = px[..., :3]
    bgr = rgb[..., ::-1]
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    body = body[::-1].tobytes()  # bottom-up row order
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def resize_nearest(pixels: object, width: int, height: int) -> object:
    """Nearest-neighbor resample to (height, width) — integer index math
    (floor of the pixel-center-free mapping), deterministic across
    platforms, pure numpy indexing."""
    import numpy as np

    px = np.asarray(pixels)
    h_in, w_in = px.shape[0], px.shape[1]
    ys = (np.arange(height) * h_in) // height
    xs = (np.arange(width) * w_in) // width
    return px[ys][:, xs]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: decode -> resample to (width, height) -> re-encode.

    Payloads that the stdlib decoder understands (BMP, 8-bit PNG — see
    decode_image) get REAL pixel math: decode, nearest-neighbor resample,
    re-encode as 24-bit BMP with media_type 'image/bmp'. Undecodable
    payloads (text bytes, JPEG, ...) keep the deterministic fake — first
    width*height payload bytes zero-padded — so the operator is total and
    row counts never depend on payload content. Either way the metadata
    recompute (byte_len, checksum) and Arrow round-trip are real.
    1 row in -> 1 row out; no shuffle; partition-parallel."""
    out_schema = (
        "doc_id long, payload binary, media_type string, byte_len long, "
        "checksum string, width int, height int"
    )
    target = width * height

    # ADVICE r3: the closure must ship BY VALUE — workers cannot import
    # this package. Nested defs always pickle by value, but the decode
    # helpers are module-level (unit-testable), so cloudpickle would
    # normally serialize them by reference (a worker-side import).
    # register_pickle_by_value flips this module to by-value pickling,
    # restoring extract_fake_features' documented contract for the whole
    # decode path. Idempotent; pyspark's vendored cloudpickle is the one
    # its serializer actually uses.
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    _decode, _encode, _resample = decode_image, encode_bmp, resize_nearest

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def fake_resize(b: bytes) -> bytes:
            body = bytes(b[:target])
            return body + b"\x00" * (target - len(body))

        def resize_one(b: bytes) -> tuple[bytes, str]:
            # the operator is TOTAL: any malformed payload — bad magic
            # (NotImplementedError), bad structure (ValueError/IndexError),
            # truncated header (struct.error), corrupt IDAT (zlib.error) —
            # falls back to the deterministic fake; row counts never
            # depend on payload content
            try:
                px = _decode(bytes(b))
            except (NotImplementedError, ValueError, IndexError,
                    _struct.error, _zlib.error):
                return fake_resize(b), None
            return _encode(_resample(px, width, height)), "image/bmp"

        for batch in batches:
            pairs = batch["payload"].map(resize_one)
            resized = pairs.map(lambda t: t[0])
            mtype = [
                t[1] if t[1] is not None else orig
                for t, orig in zip(pairs, batch["media_type"])
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "payload": resized,
                    "media_type": mtype,
                    "byte_len": resized.map(len),
                    "checksum": resized.map(
                        lambda b: _hashlib.sha256(b).hexdigest()
                    ),
                    "width": width,
                    "height": height,
                }
            )

    cols = df.select(
        "doc_id", "payload", "media_type"
    )
    return cols.mapInPandas(run, schema=out_schema)


def decode_video_frames(payload: bytes) -> list:
    """Extract per-frame payloads from a multi-frame container:

    - **RIFF/AVI** (the MJPEG case): each '..dc'/'..db' chunk in the
      'movi' list is one complete JPEG image;
    - **animated GIF**: each image descriptor is repackaged as a
      standalone single-frame GIF (header + global palette + the
      frame's descriptor/local palette/LZW data), so full-frame
      animations round-trip exactly. Each split frame decodes
      INDEPENDENTLY — for partial-frame animations (offset/undersized
      descriptors, transparency, disposal), use
      ``decode_gif_composited`` which renders full-canvas frames per
      the GIF89a Graphic Control Extension (r5).

    Every returned payload is decodable by ``decode_image`` — a real,
    fully stdlib video path. Other or frameless payloads raise
    ValueError."""
    import struct

    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_split_frames(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI or GIF payload")
    frames: list = []
    n = len(payload)

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, min(body + clen, n))
            elif cid[2:4] in (b"dc", b"db") and clen:
                frames.append(payload[body : body + clen])
            pos = body + clen + (clen & 1)  # chunks are word-aligned

    walk(12, n)
    if not frames:
        raise ValueError("AVI has no video frames")
    return frames


def _gif_split_frames(payload: bytes) -> list:
    """Repackage every frame of a (possibly animated) GIF as a
    standalone single-frame GIF sharing the original header + global
    palette. Walks the same block grammar as ``_decode_gif``."""
    import struct

    sw, sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    header = payload[:pos]
    frames: list = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension: label + sub-blocks, not carried
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        start = pos - 1
        _, _, _, _, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        while payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
        frames.append(header + payload[start:pos] + b"\x3b")
    if not frames:
        raise ValueError("GIF has no image frames")
    return frames


def encode_avi(frames: list) -> bytes:
    """Assemble frame payloads into a minimal RIFF/AVI movi list (the
    inverse of ``decode_video_frames``): '00db' chunks, word-aligned.
    Enough container structure for the decode path and MJPEG-style
    pipelines; no index/header lists (players want those, parsers that
    walk the chunk tree — like ours — don't need them)."""
    import struct

    movi = b"movi"
    for f in frames:
        movi += b"00db" + struct.pack("<I", len(f)) + bytes(f)
        if len(f) & 1:
            movi += b"\x00"
    body = b"AVI " + b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_n: int = 2
) -> DataFrame:
    """mapInPandas frame sampling: one input video payload fans out to one
    row per kept frame (row-expanding batch shape, the 1->N contract a
    real ffmpeg sampler needs). RIFF/AVI payloads get REAL container
    parsing (decode_video_frames — MJPEG frames are complete JPEGs);
    anything else keeps the deterministic fake (fixed ``frame_bytes``
    slices) so the operator is total. Every ``every_n``-th frame is kept
    either way. No shuffle; output rows carry (doc_id, frame_idx, frame
    payload, checksum)."""
    out_schema = "doc_id long, frame_idx long, frame binary, checksum string"

    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    _frames_of = decode_video_frames

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib as _hashlib
        import struct as _struct

        import pandas as _pd

        for batch in batches:
            ids, idxs, frames, sums = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    all_frames = _frames_of(bytes(payload))
                except (ValueError, NotImplementedError, _struct.error):
                    nb = max(len(payload) // frame_bytes, 1)
                    all_frames = [
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                        for i in range(nb)
                    ]
                for fi in range(0, len(all_frames), every_n):
                    chunk = bytes(all_frames[fi])
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(chunk)
                    sums.append(_hashlib.sha256(chunk).hexdigest())
            yield _pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames,
                 "checksum": sums}
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=out_schema)


def extract_fake_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: deterministic
    byte-level statistics standing in for a real media decoder
    (decode_image) — the Spark plumbing (schema, Arrow batching,
    partition-parallelism) is identical.

    The batch function is a self-contained closure (imports pandas inside,
    references nothing module-level) so cloudpickle ships it BY VALUE —
    it runs on workers that cannot import this package."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as _pd

        for batch in batches:
            payloads = batch["payload"]
            yield _pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "byte_len": payloads.map(len),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "n_zero": payloads.map(lambda b: sum(1 for x in b if x == 0)),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)
