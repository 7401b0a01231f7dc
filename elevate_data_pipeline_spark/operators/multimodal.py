"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with metadata structs; decode and feature extraction run as Arrow-batched
``mapInPandas`` stages. Decoders are REAL and dependency-free where the
format allows: netpbm P5/P6, uncompressed 24-bit BMP, 8-bit RGB/gray PNG
(stdlib zlib inflate + unfilter), RIFF/WAVE PCM16, RIFF/AVI RGB24.
Compressed codecs (JPEG/WebP, MP3/AAC, H.26x) raise a documented
``NotImplementedError`` — they need codec libraries this environment
does not ship; a deterministic byte-level feature extractor stands in
for a learned model behind the same signatures.

At 100 TB: binary payloads dominate I/O, so (a) keep them in their own
column to let column pruning skip them for metadata-only queries,
(b) size ``spark.sql.files.maxPartitionBytes`` for payload-sized rows,
(c) run extractors as mapInPandas with modest ``maxRecordsPerBatch`` so
Arrow batches fit executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_BYTE_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text column as the opaque
    binary payload plus typed metadata (real pipelines read the bytes
    from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "meta",
        F.struct(
            F.length(F.col("payload")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ),
    )


class ImageData:
    """Decoded raster: header fields + the raw interleaved pixel buffer."""

    __slots__ = ("width", "height", "channels", "maxval", "pixels")

    def __init__(self, width: int, height: int, channels: int, maxval: int, pixels: bytes):
        self.width = width
        self.height = height
        self.channels = channels
        self.maxval = maxval
        self.pixels = pixels


def encode_ppm(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Binary netpbm encoder (P6 for RGB, P5 for grayscale). ``pixels``
    is the interleaved row-major buffer; it is zero-padded / truncated
    to exactly ``width*height*channels`` bytes."""
    need = width * height * channels
    buf = pixels[:need] + b"\x00" * max(0, need - len(pixels))
    magic = b"P6" if channels == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (width, height) + buf


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(payload: bytes) -> ImageData:
    """Dependency-free image decode for the formats stdlib parsing can
    handle without codec libraries:

    - netpbm **P6** (binary RGB) and **P5** (binary grayscale);
    - **BMP** (BITMAPINFOHEADER, uncompressed 24-bit);
    - **PNG** (8-bit RGB / grayscale, non-interlaced — stdlib ``zlib``
      inflate + per-row unfilter, all five filter types).

    Other formats (JPEG/WebP/...) still raise ``NotImplementedError`` —
    they need real codec libraries. Returns :class:`ImageData` with the
    de-padded row-major pixel buffer; raises ``ValueError`` on a
    truncated or malformed payload (a decode that silently returns
    garbage would poison every stat derived downstream).
    """
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        "only netpbm P5/P6, uncompressed 24-bit BMP, and 8-bit RGB/gray "
        "PNG decode without codec libraries; got magic %r" % payload[:2]
    )


def _decode_pnm(payload: bytes) -> ImageData:
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # header = magic + 3 whitespace-separated ints (w h maxval), with
    # optional '#' comment lines; pixel buffer starts after exactly one
    # whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("malformed netpbm header")
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace separator before the buffer
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not (0 < maxval < 256):
        raise ValueError(f"bad netpbm dimensions {width}x{height} maxval={maxval}")
    need = width * height * channels
    buf = payload[pos : pos + need]
    if len(buf) != need:
        raise ValueError(f"truncated netpbm buffer: need {need}, have {len(buf)}")
    return ImageData(width, height, channels, maxval, buf)


def _decode_bmp(payload: bytes) -> ImageData:
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size} bpp={bpp} comp={compression})"
        )
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows padded to 4-byte boundaries
    rows = []
    for r in range(height):
        src = r * stride + data_off
        row = payload[src : src + row_bytes]
        if len(row) != row_bytes:
            raise ValueError(f"truncated BMP row {r}")
        # BGR -> RGB
        rows.append(bytes(ch for px in range(width) for ch in row[px * 3 : px * 3 + 3][::-1]))
    if flip:
        rows.reverse()
    return ImageData(width, height, 3, 255, b"".join(rows))


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): the neighbor (left, up, up-left)
    closest to the linear estimate a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal PNG writer: 8-bit RGB (color type 2) or grayscale (color
    type 0), non-interlaced, stdlib ``zlib`` deflate. ``pixels`` is the
    interleaved row-major buffer, zero-padded / truncated to exactly
    ``width*height*channels`` bytes. Each scanline is filtered with type
    ``row % 5`` — deliberately cycling through all five PNG filters so a
    decode round-trip exercises every unfilter path, not just None. The
    inverse of :func:`_decode_png`; used to synthesize test payloads the
    same way ``encode_ppm``/``encode_wav`` do."""
    import struct
    import zlib

    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    need = stride * height
    buf = pixels[:need] + b"\x00" * max(0, need - len(pixels))
    raw = bytearray()
    prev = b"\x00" * stride
    for r in range(height):
        row = buf[r * stride : (r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = 2 if channels == 3 else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> ImageData:
    """PNG decode via stdlib only: chunk walk with CRC verification, IDAT
    concatenation + ``zlib`` inflate, per-scanline unfilter (None / Sub /
    Up / Average / Paeth). Supports bit depth 8, color types 2 (RGB) and
    0 (grayscale), non-interlaced — the common uncompressed-training-data
    case; palette / alpha / 16-bit / Adam7 raise ``NotImplementedError``."""
    import struct
    import zlib

    if len(payload) < 8 + 25:
        raise ValueError("truncated PNG")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated PNG chunk %r" % ctype)
        (crc,) = struct.unpack(">I", payload[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk %r fails CRC" % ctype)
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2):
                raise NotImplementedError(
                    f"only 8-bit gray/RGB PNG decodes here (depth={depth} color={color})"
                )
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing not supported")
            if comp != 0 or filt != 0:
                raise ValueError(f"bad PNG header (comp={comp} filter={filt})")
            channels = 3 if color == 2 else 1
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated size {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft} on row {r}")
        out[r * stride : (r + 1) * stride] = line
        prev = line
    return ImageData(width, height, channels, 255, bytes(out))


def _byte_histogram_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned feature extractor: normalized
    8-bucket byte histogram."""
    counts = [0] * N_BYTE_FEATURES
    for b in payload:
        counts[b % N_BYTE_FEATURES] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize for any payload :func:`decode_image` can
    decode, re-encoded as netpbm (P6/P5). Nearest-neighbor (not a
    filtered kernel) keeps the operator dependency-free and exactly
    deterministic; a real pipeline swaps in a codec-backed resampler
    behind the same bytes->bytes signature."""
    img = decode_image(payload)
    ch = img.channels
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = y * img.height // height
        src_row = sy * img.width * ch
        dst_row = y * width * ch
        for x in range(width):
            sx = x * img.width // width
            s = src_row + sx * ch
            d = dst_row + x * ch
            out[d : d + ch] = img.pixels[s : s + ch]
    return encode_ppm(width, height, bytes(out), channels=ch)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sig", T.LongType()),
    ]
)

_SIG_MOD = 1_000_000_007


def attach_video_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Demo video metadata: deterministic frame count derived from the
    payload size (real pipelines carry container metadata alongside the
    bytes)."""
    return df.withColumn(
        "video_meta",
        F.struct(
            (F.length("payload") % 240 + 16).cast("int").alias("n_frames"),
            F.lit(24.0).alias("fps"),
            F.lit("video/fake").alias("mime"),
        ),
    )


def sample_frames(
    df: DataFrame, stride: int = 8, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched frame sampling: every ``stride``-th frame index of
    each video, one output row per sampled frame.

    The frame *decode* is a deterministic fake (payload-hash x index
    signature — a real decoder slots into the same loop); the Spark
    plumbing is real: mapInPandas fan-out rows-per-input-row, fixed
    output schema, pruned input columns.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, payload, n_frames in zip(
                pdf[id_col], pdf[payload_col], pdf["n_frames"]
            ):
                h = 0
                for b in payload:
                    h = (h * 31 + b) % _SIG_MOD
                for i in range(0, int(n_frames), stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    sigs.append((h * 31 + i) % _SIG_MOD)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_sig": pd.array(sigs, dtype="int64")}
            )

    pruned = df.select(id_col, payload_col, F.col("video_meta.n_frames").alias("n_frames"))
    return pruned.mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; the
    extractor runs per-row inside the batch and emits fixed-width
    feature vectors. Swap ``_byte_histogram_features`` for a real model
    without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "features": pdf[payload_col].map(_byte_histogram_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


class AudioData:
    """Decoded PCM audio: sample rate, channel count, bit depth, and the
    interleaved samples as Python ints."""

    def __init__(self, sample_rate: int, channels: int, bits: int, samples: list):
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits = bits
        self.samples = samples


def encode_wav(samples: list, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE writer: PCM, 16-bit little-endian. The inverse
    of :func:`decode_wav`; used to synthesize test payloads the same way
    ``encode_ppm`` does for images."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> AudioData:
    """Dependency-free audio decode: RIFF/WAVE with linear PCM 16-bit
    (format tag 1) — the one audio container a header parse handles
    without codec libraries. Compressed formats (MP3/AAC/opus/float
    PCM/...) raise ``NotImplementedError``; truncated or malformed
    payloads raise ``ValueError`` (a silent garbage decode would poison
    every downstream feature)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE PCM decodes without codec libraries; got magic %r"
            % payload[:4]
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _br, _ba, bits = fmt
    if tag != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit decodes without codec libraries; got tag={tag} bits={bits}"
        )
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
    return AudioData(rate, channels, bits, samples)


def audio_features(samples: list) -> dict:
    """Doc-level PCM features in exact integer arithmetic: sample count,
    peak |amplitude|, energy (sum of squares), and zero crossings (sign
    flips with >= 0 as 'positive' — matches the SQL oracle's replay)."""
    zc = sum(
        1 for i in range(1, len(samples)) if (samples[i - 1] >= 0) != (samples[i] >= 0)
    )
    return {
        "n_samples": len(samples),
        "peak": max((abs(s) for s in samples), default=0),
        "energy": sum(s * s for s in samples),
        "zero_crossings": zc,
    }


class VideoData:
    """Decoded uncompressed AVI: header metadata plus raw frame buffers."""

    def __init__(self, width: int, height: int, us_per_frame: int, frames: list):
        self.width = width
        self.height = height
        self.us_per_frame = us_per_frame
        self.frames = frames  # list[bytes], one raw RGB24 buffer per frame

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def encode_avi(
    frames: list, width: int, height: int, us_per_frame: int = 40000
) -> bytes:
    """Minimal RIFF/AVI writer: 'avih' main header + a 'movi' list of
    uncompressed '00db' RGB24 frame chunks. The inverse of
    :func:`decode_avi`; used to synthesize test payloads like
    ``encode_ppm``/``encode_wav`` do for the other modalities."""
    import struct

    avih_body = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl_body = b"hdrl" + avih  # single avih chunk is enough to replay
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    movi_body = b"movi" + b"".join(
        b"00db" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")
        for f in frames
    )
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> VideoData:
    """Dependency-free video decode: RIFF/AVI with uncompressed '00db'
    RGB24 frames — the one video container a chunk walk handles without
    codec libraries. Compressed streams ('00dc' or anything else) raise
    ``NotImplementedError``; truncated or inconsistent payloads raise
    ``ValueError`` (header frame count must match the movi chunks)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "only RIFF/AVI with uncompressed frames decodes without codec "
            "libraries; got magic %r" % payload[:4]
        )
    width = height = us_per_frame = declared = None
    frames: list = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, us_per_frame, declared
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + clen]
            if len(body) < clen:
                raise ValueError("truncated chunk %r" % cid)
            if cid == b"LIST":
                walk(body[4:])  # skip the list type tag
            elif cid == b"avih":
                f = struct.unpack("<14I", body[:56])
                us_per_frame, declared, width, height = f[0], f[4], f[8], f[9]
            elif cid == b"00db":
                frames.append(bytes(body))
            elif cid == b"00dc":
                raise NotImplementedError(
                    "compressed AVI frames need a codec library"
                )
            pos += 8 + clen + (clen & 1)

    walk(payload[12:])
    if width is None:
        raise ValueError("missing avih header")
    if declared != len(frames):
        raise ValueError(
            f"avih declares {declared} frames but movi carries {len(frames)}"
        )
    return VideoData(width, height, us_per_frame, frames)
