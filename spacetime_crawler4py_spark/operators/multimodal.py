"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side architecture here is real and tested — schemas,
partition-preserving batch flow, UDF signatures, batch shapes.

Codecs: the container has no image/audio libraries, so the REAL
path is pure-stdlib parsers for the two uncompressed container
formats stdlib can express:

- image: BMP (BITMAPINFOHEADER, 24-bpp, BI_RGB) — header offsets
  per the public Windows BMP layout; bottom-up rows, 4-byte row
  padding, BGR byte order.
- audio: RIFF/WAVE PCM via the stdlib ``wave`` module (8/16-bit).

``encode_bmp``/``encode_wav`` produce those formats so fixtures
and the synthetic media generator exercise the real decode path
end-to-end.  Compressed formats (JPEG/PNG/MP3/MP4) still raise
NotImplementedError unless ``fake=True``, which substitutes a
deterministic content-hash-derived stand-in.

Design for 100 TB of media:
- media rows are (id, kind, media binary, meta struct) — the binary
  never crosses a shuffle: featurize FIRST (mapInPandas, narrow),
  then join/aggregate on the small feature output.
- ``maxRecordsPerBatch`` bounds Arrow batch memory (a 10k-row batch
  of 1 MB blobs is 10 GB — callers repartition by size and lower
  the batch cap; ``featurize`` takes ``target_batch_bytes``).
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def encode_bmp(img: np.ndarray) -> bytes:
    """HxWx3 uint8 (RGB) → 24-bpp BI_RGB BMP bytes (pure stdlib)."""
    import struct

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_pad = (-(w * 3)) % 4
    pixel_bytes = (w * 3 + row_pad) * h
    off = 14 + 40
    out = bytearray()
    out += struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    out += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    pad = b"\x00" * row_pad
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1]  # RGB → BGR
        out += row.tobytes() + pad
    return bytes(out)


def decode_image(raw: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image to HxWx3 uint8 (RGB).

    REAL paths: uncompressed 24-bpp BI_RGB BMP (struct parse) and
    8-bit non-interlaced RGB/RGBA PNG (decode_png — zlib inflate +
    filter reconstruction, all stdlib).  JPEG and friends need
    codecs absent from this container → NotImplementedError, or the
    deterministic stand-in when ``fake=True``.
    """
    import struct

    if raw[:8] == _PNG_SIG:
        try:
            return decode_png(raw)
        except NotImplementedError:
            if not fake:
                raise
    if len(raw) >= 54 and raw[:2] == b"BM":
        off = struct.unpack_from("<I", raw, 10)[0]
        hdr_size = struct.unpack_from("<I", raw, 14)[0]
        if hdr_size >= 40:
            w, h = struct.unpack_from("<ii", raw, 18)
            bpp = struct.unpack_from("<H", raw, 28)[0]
            comp = struct.unpack_from("<I", raw, 30)[0]
            if bpp == 24 and comp == 0 and w > 0 and h != 0:
                bottom_up = h > 0
                h = abs(h)
                stride = (w * 3 + 3) & ~3
                px = np.frombuffer(raw, np.uint8, count=stride * h, offset=off)
                rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                if bottom_up:
                    rows = rows[::-1]
                return rows[:, :, ::-1].copy()  # BGR → RGB
    if not fake:
        raise NotImplementedError(
            "only uncompressed 24-bpp BMP decodes without codec "
            "libraries; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (spec §9, vectorized over int arrays)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """HxWx{3,4} uint8 → 8-bit color-type 2/6 PNG bytes (stdlib
    zlib only).  ``filter_type`` applies that PNG filter (0-4) to
    every scanline so fixtures exercise each reconstruction branch
    of decode_png."""
    import struct
    import zlib

    h, w, c = img.shape
    assert c in (3, 4) and img.dtype == np.uint8 and 0 <= filter_type <= 4
    ctype = 2 if c == 3 else 6

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    scan = bytearray()
    prior = np.zeros((w, c), np.int32)
    for y in range(h):
        cur = img[y].astype(np.int32)
        left = np.vstack([np.zeros((1, c), np.int32), cur[:-1]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:  # Sub
            filt = cur - left
        elif filter_type == 2:  # Up
            filt = cur - prior
        elif filter_type == 3:  # Average
            filt = cur - (left + prior) // 2
        else:  # Paeth
            ul = np.vstack([np.zeros((1, c), np.int32), prior[:-1]])
            filt = cur - _paeth(left, prior, ul)
        scan += bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes()
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def decode_png(raw: bytes) -> np.ndarray:
    """8-bit non-interlaced RGB/RGBA PNG → HxWx3 uint8 (alpha
    dropped) — IHDR/IDAT parse, zlib inflate, and per-scanline
    filter reconstruction (types 0-4 per the PNG spec §9), all
    stdlib+numpy.  Palette/16-bit/interlaced PNGs raise
    NotImplementedError (genuinely need no codec, but are not worth
    the surface until a corpus needs them)."""
    import struct
    import zlib

    if raw[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG signature")
    pos, idat = 8, bytearray()
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(raw):
        ln, typ = struct.unpack_from(">I4s", raw, pos)
        data = raw[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise NotImplementedError("truncated PNG chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced RGB/RGBA PNG decodes here "
            f"(got depth={depth} color_type={ctype} interlace={interlace})"
        )
    c = 3 if ctype == 2 else 4
    stride = w * c
    dec = zlib.decompress(bytes(idat))
    if len(dec) != h * (stride + 1):
        raise NotImplementedError("truncated PNG scanline data")
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        ft = dec[p]
        line = np.frombuffer(dec, np.uint8, stride, p + 1).astype(np.int32)
        p += 1 + stride
        if ft == 0:
            rec = line
        elif ft == 2:  # Up — no intra-row dependency, vectorized
            rec = (line + prior) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the just-reconstructed
            # left pixel → sequential in x (bpp-strided)
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prior[x])
                cc = int(prior[x - c]) if x >= c else 0
                if ft == 1:
                    rec[x] = (line[x] + a) % 256
                elif ft == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    pp = a + b - cc
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    rec[x] = (line[x] + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    return out.reshape(h, w, c)[:, :, :3].copy()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 waveform in [-1, 1] → 16-bit PCM WAV bytes (stdlib)."""
    import io
    import wave

    pcm = np.clip(samples, -1.0, 1.0)
    pcm = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio(raw: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a mono float32 waveform in [-1, 1].

    REAL path: RIFF/WAVE PCM (8/16-bit) via the stdlib ``wave``
    module.  Compressed audio → NotImplementedError / fake stand-in.
    """
    import io
    import wave

    if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        try:
            with wave.open(io.BytesIO(raw), "rb") as w:
                nch, width, nframes = w.getnchannels(), w.getsampwidth(), w.getnframes()
                frames = w.readframes(nframes)
            if width == 2:
                x = np.frombuffer(frames, "<i2").astype(np.float32) / 32767.0
            elif width == 1:
                x = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) / 128.0
            else:
                raise wave.Error(f"unsupported sample width {width}")
            if nch > 1:
                x = x.reshape(-1, nch).mean(axis=1)
            return x
        except wave.Error:
            pass  # non-PCM / malformed → fall through
    if not fake:
        raise NotImplementedError(
            "only PCM WAV decodes without codec libraries; pass fake=True"
        )
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(256).astype(np.float32)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (the UDF-side 'resize'
    op for thumbnailing/feature grids — no image library)."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int) -> list[float]:
    """Deterministic real features from decoded pixels: per-channel
    mean/std + a nearest-neighbor-resized grayscale grid, truncated
    or zero-padded to ``dim``."""
    stats = [
        float(img[:, :, c].mean() / 255.0) for c in range(3)
    ] + [float(img[:, :, c].std() / 255.0) for c in range(3)]
    side = max(int(np.ceil(np.sqrt(max(dim - 6, 1)))), 1)
    grid = resize_image(img, side, side).mean(axis=2).ravel() / 255.0
    v = (stats + [float(g) for g in grid])[:dim]
    return v + [0.0] * (dim - len(v))


def audio_features(x: np.ndarray, dim: int) -> list[float]:
    """Deterministic real features from a waveform: RMS, zero-cross
    rate, then coarse FFT magnitude bands, sized to ``dim``."""
    if len(x) == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(x**2)))
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        if len(x) > 1
        else 0.0
    )
    n_bands = max(dim - 2, 1)
    mag = np.abs(np.fft.rfft(x))
    bands = [
        float(b.mean()) if len(b) else 0.0
        for b in np.array_split(mag, n_bands)
    ]
    v = ([rms, zcr] + bands)[:dim]
    return v + [0.0] * (dim - len(v))


def _fake_features(raw: bytes, dim: int) -> list[float]:
    """Deterministic unit-norm feature vector from content hash —
    the stand-in for a real image/audio embedding model."""
    h = hashlib.sha256(raw).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    return [float(x) for x in v]


def featurize(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    dim: int = 16,
    fake: bool = True,
    target_batch_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """(id, kind, features array<float>, n_bytes) via mapInPandas.

    The binary column is consumed inside the UDF and NOT emitted —
    downstream joins/aggregations only move the small feature rows.
    """
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("kind", StringType()),
            StructField("features", ArrayType(FloatType())),
            StructField("n_bytes", LongType()),
        ]
    )

    def one(kind: str, raw: bytes) -> list[float]:
        if fake:
            return _fake_features(raw, dim)
        if kind == "audio":
            return audio_features(decode_audio(raw), dim)
        # image, or a video whose payload is a raw frame dump (BMP):
        # real video containers need codecs this environment lacks.
        return image_features(decode_image(raw), dim)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = pdf[media_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "kind": pdf["kind"],
                    "features": [
                        one(k, bytes(r))
                        for k, r in zip(pdf["kind"], raws)
                    ],
                    "n_bytes": [len(r) for r in raws],
                }
            )

    return media.select(id_col, "kind", media_col).mapInPandas(gen, out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Explode a video row into (media_id, frame_ts_ms) sampling
    points from metadata ONLY — no decode; the decode happens later,
    per frame-partition, in featurize.  JVM-side sequence/explode."""
    return media.where(F.col("kind") == "video").select(
        id_col,
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media(
    spark, n: int = 64, seed: int = 42, real: bool = False
) -> DataFrame:
    """Deterministic synthetic media table for tests/bench.

    ``real=True`` emits genuinely decodable payloads (24-bpp BMP
    images, PCM WAV audio, BMP frame dumps for video) so the
    non-fake featurize path runs end-to-end; default is opaque
    random bytes for plumbing-only tests.
    """
    import random

    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if real:
            if kind == "audio":
                wave_f = nprng.standard_normal(rng.randint(256, 1024)) * 0.2
                raw = encode_wav(wave_f.astype(np.float32))
                w = h = 0
            elif kind == "video":
                w, h = rng.randint(4, 16), rng.randint(4, 16)
                n_frames = rng.randint(2, 6)
                raw = encode_frames([
                    nprng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    for _ in range(n_frames)
                ])
            else:
                w, h = rng.randint(4, 24), rng.randint(4, 24)
                img = nprng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                # alternate container + filter so the corpus
                # exercises both real image codecs and every PNG
                # reconstruction branch
                if (i // 3) % 2 == 0:
                    raw = encode_bmp(img)
                else:
                    raw = encode_png(img, filter_type=(i // 6) % 5)
            mime = {
                "image": "image/png" if raw[:8] == _PNG_SIG else "image/bmp",
                "audio": "audio/wav",
                "video": "video/x-raw-frame",
            }[kind]
        else:
            raw = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
            w, h = rng.randint(16, 64), rng.randint(16, 64)
            mime = "application/octet-stream"
        meta = (
            mime,
            w,
            h,
            rng.randint(1000, 10000) if kind == "video" else 0,
            len(raw),
        )
        rows.append((i, kind, bytearray(raw), meta))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("media", BinaryType()),
            StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------ video frame stream


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """List of HxWx3 uint8 frames → concatenated-BMP payload (each
    BMP self-describes its byte length in the file header at offset
    2, so the stream is seekable without an index)."""
    return b"".join(encode_bmp(f) for f in frames)


def frame_offsets(raw: bytes) -> list[int]:
    """Byte offsets of each BMP frame in a concatenated-BMP payload."""
    import struct

    offs = []
    pos = 0
    while pos + 6 <= len(raw) and raw[pos : pos + 2] == b"BM":
        offs.append(pos)
        size = struct.unpack_from("<I", raw, pos + 2)[0]
        if size <= 0:
            break
        pos += size
    return offs


def decode_frame(raw: bytes, idx: int, fake: bool = False) -> np.ndarray:
    """Decode frame ``idx`` of a concatenated-BMP video payload
    (clamped to the last frame, mirroring how a sampler past EOF
    holds the final frame)."""
    offs = frame_offsets(raw)
    if not offs:
        return decode_image(raw, fake=fake)
    idx = max(0, min(idx, len(offs) - 1))
    return decode_image(raw[offs[idx] :], fake=fake)


def featurize_frames(
    media: DataFrame,
    every_ms: int = 1000,
    frame_interval_ms: int = 1000,
    dim: int = 16,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """(media_id, frame_ts_ms, features): REAL end-to-end video
    path — sampling points come from metadata only
    (frame_sample_plan, no decode), then ONE mapInPandas pass per
    video decodes exactly the sampled frames from the
    concatenated-BMP payload and featurizes them.

    Scale shape: the ts list is aggregated per media_id (bounded by
    duration/every_ms) and joined to the payload, so each video's
    binary crosses into Python once, carrying all its sample points
    — never once per frame.
    """
    from collections.abc import Iterator

    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    plan = (
        frame_sample_plan(media, every_ms=every_ms, id_col=id_col)
        .groupBy(id_col)
        .agg(F.collect_list("frame_ts_ms").alias("_ts_list"))
    )
    src = media.select(id_col, media_col).join(plan, id_col)
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_ts_ms", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, feats = [], [], []
            for mid, raw, ts_list in zip(
                pdf[id_col], pdf[media_col], pdf["_ts_list"]
            ):
                raw = bytes(raw)
                for ts in sorted(ts_list):
                    img = decode_frame(raw, int(ts) // frame_interval_ms)
                    ids.append(mid)
                    tss.append(int(ts))
                    feats.append(image_features(img, dim))
            yield pd.DataFrame(
                {id_col: ids, "frame_ts_ms": tss, "features": feats}
            )

    return src.mapInPandas(gen, out_schema)
