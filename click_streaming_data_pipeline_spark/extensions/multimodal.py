"""Multimodal column plumbing (beyond-reference extension).

Images/audio/video are opaque ``binary`` columns + a typed metadata
struct; decode/feature-extract run as Arrow-batched ``mapInPandas``
stages. The actual codecs (PIL/librosa/av) are NOT in this container,
so the decode step is a clearly marked stub: ``decode_stub=True``
(default) produces a deterministic fake feature row with the real
schema/batching; ``decode_stub=False`` raises ``NotImplementedError``
where the real decoder would run. The Spark-side plumbing — schema,
binary handling, Arrow batch shapes, partition-parallel UDF — is real
and tested.

Scale: binary payloads ride the scan (parquet/``binaryFile``); feature
extraction parallelizes per partition with Arrow transfer; keep
``spark.sql.files.maxPartitionBytes`` sized so one partition's blobs
fit executor memory.

One lane decodes for REAL: ``decode_pgm`` parses P5/PGM (netpbm)
images with pure numpy - genuine format grammar, payload validation,
and decode_ok dead-lettering; PNG/JPEG swap in a codec call behind
the same schema.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset table: opaque bytes + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FEATURE_DIM = 8


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Model the documents' text bodies as opaque binary assets —
    the stand-in for an image/audio blob column (same plumbing the
    reference uses for S3 bodies, storage.py:40-61)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )


def extract_features(assets: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    With ``decode_stub`` (default), emits a deterministic fake
    feature: byte-length plus an 8-dim vector derived from byte sums
    over equal strides — stable across runs/partitionings. Without it,
    raises NotImplementedError where a real decoder (PIL/librosa)
    would be called per batch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/librosa/av; "
                    "not available in this environment"
                )
            feats = []
            for blob in pdf["content"]:
                b = bytes(blob)
                stride = max(1, len(b) // FEATURE_DIM)
                vec = [
                    float(sum(b[i * stride : (i + 1) * stride]) % 997)
                    for i in range(FEATURE_DIM)
                ]
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(bytes(x)) for x in pdf["content"]],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# temporal frame sampling (the video lane)

#: stub frame size: a real decoder yields frames from the container
#: structure; the stub treats the blob as fixed-width frame records.
FRAME_BYTES = 32

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("frame_idx", LongType()),
        StructField("frame_len", LongType()),
        StructField("frame_sum", LongType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    *,
    every: int = 4,
    frame_bytes: int = FRAME_BYTES,
    decode_stub: bool = True,
) -> DataFrame:
    """Uniform temporal frame sampling over video-like binary columns:
    frame i covers bytes [i*fb, (i+1)*fb); every ``every``-th frame is
    emitted with a per-frame stub feature (byte sum mod 997) — the
    1:N cardinality change a real frame sampler produces, with the
    same Arrow ``mapInPandas`` shape a PyAV-backed decoder would use
    (``decode_stub=False`` raises where that decoder would run).

    Scale: output fan-out is bounded by len/(fb*every) per asset;
    sampling happens INSIDE the scan stage (no shuffle), so 100 TB of
    video reduces to the sampled frames before anything wide runs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decoding requires av/ffmpeg; "
                    "not available in this environment"
                )
            out: dict[str, list] = {
                "asset_id": [],
                "media_type": [],
                "frame_idx": [],
                "frame_len": [],
                "frame_sum": [],
            }
            for aid, mt, blob in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(blob)
                n_frames = -(-len(b) // frame_bytes) if b else 0
                for idx in range(0, n_frames, every):
                    chunk = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["asset_id"].append(aid)
                    out["media_type"].append(mt)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(chunk))
                    out["frame_sum"].append(sum(chunk) % 997)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# windowed energy (the audio lane)

#: stub analysis window/hop in bytes: a real pipeline windows PCM
#: samples (e.g. 25 ms window / 10 ms hop); the stub windows raw bytes.
AUDIO_WIN_BYTES = 32
AUDIO_HOP_BYTES = 16

ENERGY_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("win_idx", LongType()),
        StructField("win_len", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_energy(
    assets: DataFrame,
    *,
    win: int = AUDIO_WIN_BYTES,
    hop: int = AUDIO_HOP_BYTES,
    decode_stub: bool = True,
) -> DataFrame:
    """Overlapping windowed energy over audio-like binary columns:
    window w covers bytes [w*hop, w*hop+win); its stub "energy" is the
    sum of squared byte values mod 9973 — the integer-exact stand-in
    for short-time RMS energy a librosa-backed decoder would compute
    (``decode_stub=False`` raises where that decoder would run).
    Overlap (hop < win) yields the 1:N fan-out with SHARED input bytes
    that distinguishes the audio lane from plain frame slicing.

    Scale: like ``sample_frames``, windowing runs inside the scan
    stage (Arrow ``mapInPandas``, no shuffle); output rows per asset
    are bounded by len/hop.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real audio decoding requires librosa/soundfile; "
                    "not available in this environment"
                )
            out: dict[str, list] = {
                "asset_id": [],
                "media_type": [],
                "win_idx": [],
                "win_len": [],
                "energy": [],
            }
            for aid, mt, blob in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(blob)
                for w, start in enumerate(range(0, len(b), hop)):
                    chunk = b[start : start + win]
                    out["asset_id"].append(aid)
                    out["media_type"].append(mt)
                    out["win_idx"].append(w)
                    out["win_len"].append(len(chunk))
                    out["energy"].append(
                        sum(x * x for x in chunk) % 9973
                    )
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=ENERGY_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image decode: P5/PGM (netpbm grayscale), parsed with pure numpy
#
# PNG/JPEG need codec libraries this container lacks — but netpbm is a
# real, documented image format a pure-numpy parser handles, so this
# lane exercises genuine decode (header grammar, payload validation,
# pixel math), not a stub. Swap _parse_pgm for a PIL call and nothing
# else changes.

PGM_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("maxval", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)


def synth_pgm_assets(docs: DataFrame) -> DataFrame:
    """Encode each document's ASCII body as a REAL single-row P5/PGM
    image (header + raw 8-bit pixels) — a valid netpbm file any image
    tool opens; doc bytes become the pixel row."""
    header = F.concat_ws(
        "", F.lit("P5\n"), F.octet_length("text").cast("string"),
        F.lit(" 1\n255\n"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.concat(
            F.encode(header, "utf-8"), F.encode("text", "utf-8")
        ).alias("content"),
    )


def _parse_pgm(b: bytes):
    """Minimal strict P5 parser: magic, whitespace-separated width/
    height/maxval (comments not supported — reject), then exactly
    width*height raw bytes. Returns (w, h, maxval, ndarray) or None."""
    import numpy as np

    if not b.startswith(b"P5"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos or not b[start:pos].isdigit():
            return None
        fields.append(int(b[start:pos]))
    if len(fields) < 3 or pos >= len(b):
        return None
    pos += 1  # single whitespace after maxval per spec
    w, h, maxval = fields
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
        return None
    if len(b) - pos != w * h:
        return None
    px = np.frombuffer(b[pos:], dtype=np.uint8).reshape(h, w)
    return w, h, maxval, px


def decode_pgm(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode: parse each P5 blob, validate,
    and emit exact integer pixel statistics; malformed blobs emit a
    decode_ok=false dead-letter row instead of failing the batch (the
    I6 error-handling contract applied to media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in PGM_DECODE_SCHEMA.fields}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                parsed = _parse_pgm(bytes(blob))
                rows["asset_id"].append(aid)
                if parsed is None:
                    rows["decode_ok"].append(False)
                    for k in ("width", "height", "maxval",
                              "px_sum", "px_min", "px_max"):
                        rows[k].append(None)
                    continue
                w, h, maxval, px = parsed
                rows["decode_ok"].append(True)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["maxval"].append(maxval)
                rows["px_sum"].append(int(px.sum(dtype="int64")))
                rows["px_min"].append(int(px.min()))
                rows["px_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=PGM_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode: WAV (RIFF, 8-bit PCM), parsed with pure numpy —
# same story as the PGM lane: a genuine documented container format
# handled without codec libraries; mp3/flac would swap in soundfile
# behind the same schema.

WAV_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("amp_sum", LongType()),
        StructField("amp_sumsq", LongType()),
        StructField("amp_min", LongType()),
        StructField("amp_max", LongType()),
    ]
)

WAV_SAMPLE_RATE = 8000


def synth_wav_assets(docs: DataFrame) -> DataFrame:
    """Pack each document's ASCII bytes as a REAL mono 8-bit PCM WAV
    file (RIFF/fmt/data chunks, correct little-endian sizes) — text
    bytes become the waveform. Arrow-batched packer; any WAV tool
    plays the output."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for txt in pdf["text"]:
                data = txt.encode("utf-8")
                fmt = struct.pack(
                    "<4sIHHIIHH", b"fmt ", 16, 1, 1,
                    WAV_SAMPLE_RATE, WAV_SAMPLE_RATE, 1, 8,
                )
                payload = fmt + struct.pack("<4sI", b"data", len(data)) + data
                riff = struct.pack(
                    "<4sI4s", b"RIFF", 4 + len(payload), b"WAVE"
                )
                blobs.append(riff + payload)
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "content": blobs}
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches,
        schema=StructType(
            [
                StructField("asset_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def _parse_wav(b: bytes):
    """Strict RIFF/WAVE walker: verifies magics and sizes, requires
    uncompressed mono 8-bit PCM, returns (sample_rate, uint8 samples)
    or None."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    (riff_size,) = struct.unpack("<I", b[4:8])
    if riff_size != len(b) - 8:
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, csize = struct.unpack("<4sI", b[pos : pos + 8])
        body = b[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            return None
        if cid == b"fmt ":
            if csize < 16:
                return None
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 8:
                return None
            fmt = rate
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    return fmt, np.frombuffer(data, dtype=np.uint8)


def decode_wav(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: walk the RIFF container,
    validate the PCM format chunk, and emit exact integer amplitude
    statistics; malformed blobs dead-letter with decode_ok=false."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in WAV_DECODE_SCHEMA.fields}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                parsed = _parse_wav(bytes(blob))
                rows["asset_id"].append(aid)
                if parsed is None or len(parsed[1]) == 0:
                    rows["decode_ok"].append(False)
                    for k in ("sample_rate", "n_samples", "amp_sum",
                              "amp_sumsq", "amp_min", "amp_max"):
                        rows[k].append(None)
                    continue
                rate, s = parsed
                rows["decode_ok"].append(True)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s))
                rows["amp_sum"].append(int(s.sum(dtype="int64")))
                rows["amp_sumsq"].append(
                    int((s.astype("int64") ** 2).sum())
                )
                rows["amp_min"].append(int(s.min()))
                rows["amp_max"].append(int(s.max()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=WAV_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video decode: Y4M / YUV4MPEG2 (uncompressed), pure numpy —
# completes the real-decode trio (PGM image, WAV audio, Y4M video).
# The container is genuinely parsed: ASCII stream header with tagged
# parameters, per-frame FRAME markers, raw luma planes. H.264/VP9
# would swap in PyAV behind the same schema.

Y4M_FRAME_W = 16

Y4M_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("luma_sum", LongType()),
        StructField("luma_min", LongType()),
        StructField("luma_max", LongType()),
    ]
)


def synth_y4m_assets(docs: DataFrame, *, frame_w: int = Y4M_FRAME_W) -> DataFrame:
    """Pack each document's ASCII bytes as a REAL Y4M video: stream
    header ``YUV4MPEG2 W{w} H1 F25:1 Cmono`` then one FRAME per
    ``frame_w`` full bytes of text (1xw mono luma planes; the tail
    partial frame is dropped). Any y4m-aware tool plays the output."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                data = txt.encode("utf-8")
                n_frames = len(data) // frame_w
                if n_frames == 0:
                    continue
                out = [f"YUV4MPEG2 W{frame_w} H1 F25:1 Cmono\n".encode()]
                for f in range(n_frames):
                    out.append(b"FRAME\n")
                    out.append(data[f * frame_w : (f + 1) * frame_w])
                ids.append(did)
                blobs.append(b"".join(out))
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        batches,
        schema=StructType(
            [
                StructField("asset_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def _parse_y4m(b: bytes):
    """Strict YUV4MPEG2 parser: tagged header (W/H required, Cmono
    luma-only), then FRAME-delimited raw planes of exactly W*H bytes.
    Returns (w, h, [ndarray per frame]) or None."""
    import numpy as np

    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        return None
    w = h = None
    mono = False
    for tok in b[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            mono = tok[1:] == b"mono"
    if not w or not h or w <= 0 or h <= 0 or not mono:
        return None
    frame_bytes, pos, frames = w * h, nl + 1, []
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or b[pos : pos + 5] != b"FRAME":
            return None
        start = fnl + 1
        if start + frame_bytes > len(b):
            return None
        frames.append(
            np.frombuffer(b[start : start + frame_bytes], dtype=np.uint8)
        )
        pos = start + frame_bytes
    if not frames:
        return None
    return w, h, frames


def decode_y4m(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL video decode: walk the Y4M container and
    emit one row PER FRAME with exact integer luma statistics — the
    1:N temporal fan-out of a real frame pipeline. Malformed blobs
    are dropped (dead-letter branch would mirror decode_pgm's)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in Y4M_DECODE_SCHEMA.fields}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                parsed = _parse_y4m(bytes(blob))
                if parsed is None:
                    continue
                _, _, frames = parsed
                for idx, fr in enumerate(frames):
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(idx)
                    rows["luma_sum"].append(int(fr.sum(dtype="int64")))
                    rows["luma_min"].append(int(fr.min()))
                    rows["luma_max"].append(int(fr.max()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=Y4M_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL compressed-image decode: PNG (8-bit grayscale), pure
# python/numpy + the stdlib zlib codec. Unlike the uncompressed
# PGM/WAV/Y4M lanes this one exercises a genuine compression stack:
# chunk walking with CRC32 verification, IDAT inflate, and scanline
# filter reconstruction (None/Sub/Up/Average/Paeth) — the actual work
# a PNG library does. JPEG would swap a DCT codec into the same slot.

PNG_DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", _z.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png_gray8(rows: list[bytes], filters: list[int] | None = None) -> bytes:
    """A REAL (spec-conformant) 8-bit grayscale PNG encoder: IHDR +
    one zlib-deflated IDAT + IEND, CRC32 on every chunk. ``filters``
    picks the per-scanline filter (default: Sub for the first row, Up
    after — so decoding must actually reconstruct)."""
    import struct
    import zlib as _z

    h, w = len(rows), len(rows[0])
    if filters is None:
        filters = [1] + [2] * (h - 1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = bytes(w)
    for row, flt in zip(rows, filters):
        raw.append(flt)
        for j in range(w):
            left = row[j - 1] if j else 0
            up = prev[j]
            if flt == 0:
                pred = 0
            elif flt == 1:
                pred = left
            elif flt == 2:
                pred = up
            elif flt == 3:
                pred = (left + up) // 2
            else:  # 4: Paeth
                ul = prev[j - 1] if j else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            raw.append((row[j] - pred) & 0xFF)
        prev = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(left: int, up: int, ul: int) -> int:
    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else ul


def _parse_png(b: bytes):
    """Strict 8-bit-grayscale PNG decoder: signature, chunk walk with
    CRC32 verification, IDAT inflate, scanline filter reconstruction
    (all five filter types). Returns (w, h, ndarray) or None."""
    import struct
    import zlib as _z

    import numpy as np

    if not b.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat, ended = len(_PNG_SIG), None, bytearray(), False
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        payload = b[pos + 8 : pos + 8 + ln]
        if len(payload) != ln or pos + 12 + ln > len(b):
            return None
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if _z.crc32(typ + payload) & 0xFFFFFFFF != crc:
            return None
        if typ == b"IHDR":
            ihdr = payload
        elif typ == b"IDAT":
            idat.extend(payload)
        elif typ == b"IEND":
            ended = True
            break
        pos += 12 + ln
    if ihdr is None or not ended or len(ihdr) != 13:
        return None
    w, h, depth, ctype, comp, flt, ilace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or ctype != 0 or comp != 0 or flt != 0 or ilace != 0:
        return None
    if w <= 0 or h <= 0:
        return None
    try:
        raw = _z.decompress(bytes(idat))
    except _z.error:
        return None
    if len(raw) != h * (w + 1):
        return None
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for i in range(h):
        line = raw[i * (w + 1) : (i + 1) * (w + 1)]
        ftype, data = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if ftype == 0:
            rec = data.astype(np.int32)
        elif ftype == 1:  # Sub: prefix sum mod 256
            rec = np.cumsum(data.astype(np.int64)) % 256
        elif ftype == 2:  # Up
            rec = (data.astype(np.int32) + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: sequential
            rec = np.zeros(w, dtype=np.int32)
            for j in range(w):
                left = int(rec[j - 1]) if j else 0
                up = int(prev[j])
                ul = int(prev[j - 1]) if j else 0
                pred = (
                    (left + up) // 2 if ftype == 3 else _paeth(left, up, ul)
                )
                rec[j] = (int(data[j]) + pred) % 256
        else:
            return None
        out[i] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    return w, h, out


def synth_png_assets(docs: DataFrame) -> DataFrame:
    """Each document becomes a real 2-row grayscale PNG: row 0 = the
    ASCII bytes (Sub-filtered), row 1 = the bytes reversed
    (Up-filtered) — decoding exercises inflate + two reconstruction
    filters, and the pixel stats stay exactly derivable from the
    text for the oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = [
                encode_png_gray8([t.encode("utf-8"), t.encode("utf-8")[::-1]])
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["doc_id"], "content": content}
            )

    return docs.select("doc_id", "text").mapInPandas(
        batches,
        schema=StructType(
            [
                StructField("asset_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def resize_png_gray8(
    assets: DataFrame, out_h: int, out_w: int | None = None
) -> DataFrame:
    """REAL image resize: decode the grayscale PNG, NEAREST-NEIGHBOR
    resample on the pixel matrix (pure integer index mapping
    ``src = (dst * in_extent) // out_extent`` — deterministic, no
    float resampling kernels), re-encode as a spec-conformant PNG.
    The missing quarter of the decode/feature/RESIZE/frame-sample
    multimodal quartet, and the only one that must round-trip the
    codec twice. ``out_w=None`` -> halve the width (ceil).

    Corrupt inputs pass through with ``resize_ok`` false and the
    original bytes (I6 dead-letter contract, same as decode_png).

    Scale: scan-stage Arrow batches, zero shuffle; per-row cost is
    bounded by the decoded pixel count.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out_ids, out_blobs, out_ok, ws, hs = [], [], [], [], []
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                parsed = _parse_png(bytes(blob))
                out_ids.append(aid)
                if parsed is None:
                    out_blobs.append(bytes(blob))
                    out_ok.append(False)
                    ws.append(None)
                    hs.append(None)
                    continue
                in_w, in_h, px = parsed
                ow = out_w if out_w is not None else (in_w + 1) // 2
                oh = out_h
                cols = (np.arange(ow, dtype=np.int64) * in_w) // ow
                rows_ = (np.arange(oh, dtype=np.int64) * in_h) // oh
                small = px[np.ix_(rows_, cols)]
                out_blobs.append(
                    encode_png_gray8([bytes(r) for r in small])
                )
                out_ok.append(True)
                ws.append(ow)
                hs.append(oh)
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "content": out_blobs,
                    "resize_ok": out_ok,
                    "out_w": ws,
                    "out_h": hs,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        batches,
        schema=StructType(
            [
                StructField("asset_id", LongType()),
                StructField("content", BinaryType()),
                StructField("resize_ok", BooleanType()),
                StructField("out_w", LongType()),
                StructField("out_h", LongType()),
            ]
        ),
    )


def decode_png(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL compressed-image decode with the I6
    dead-letter contract (CRC/zlib/filter failures -> decode_ok
    false, never a task failure)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k.name: [] for k in PNG_DECODE_SCHEMA.fields}
            for aid, blob in zip(pdf["asset_id"], pdf["content"]):
                parsed = _parse_png(bytes(blob))
                rows["asset_id"].append(aid)
                if parsed is None:
                    rows["decode_ok"].append(False)
                    for k in ("width", "height", "px_sum", "px_min", "px_max"):
                        rows[k].append(None)
                    continue
                w, h, px = parsed
                rows["decode_ok"].append(True)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["px_sum"].append(int(px.sum(dtype="int64")))
                rows["px_min"].append(int(px.min()))
                rows["px_max"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, schema=PNG_DECODE_SCHEMA)
