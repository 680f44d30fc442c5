"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side machinery — schema, batch iteration, partition sizing,
metadata propagation — is real and tested.  The codec layer is REAL for
the public formats a NumPy-only environment can handle:

- **image**: binary Netpbm — P6 PPM (RGB) and P5 PGM (grayscale),
  maxval<=255 — full header parse, pixel decode to an (h, w, 3) / (h, w)
  array, encode back, nearest-neighbor resize.
- **video**: concatenated P6/P5 frames — exactly what ``ffmpeg -f
  image2pipe -vcodec ppm`` (or ``-pix_fmt gray``) emits — frame counting
  and true frame extraction.
- **audio**: RIFF/WAVE header parse (PCM frame count from the data chunk
  and block-align).

Payloads in any OTHER format (JPEG/PNG/MP4/...) fall back to a clearly
deterministic fake "decoder" (shape/fingerprint derived from the bytes)
behind the same UDF signature — swap ``_decode_payload``'s fallback branch
for PIL/libvips/pyav calls on a cluster that has them; the Arrow plumbing
is identical either way.

Media references from the docs model (``media`` spans / ``media_ref``
pointers like ``aln://db/batch001.pairwise#hit``) resolve through
``fetch_media_stub`` the same way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)


# ---------------------------------------------------------------------------
# real codecs (pure NumPy, public formats)
# ---------------------------------------------------------------------------
_NETPBM_CHANNELS = {b"P5": 1, b"P6": 3}  # binary PGM grayscale / PPM RGB


def _ppm_header(b: bytes, offset: int = 0) -> tuple[int, int, int, int]:
    """Parse a binary netpbm (P5 PGM / P6 PPM) header starting at
    ``offset`` -> (width, height, maxval, raster_start).  Follows the
    Netpbm spec: tokens separated by whitespace, ``#`` comments run to
    end-of-line, exactly ONE whitespace byte after maxval before the
    raster.  Channel count comes from the magic
    (``_NETPBM_CHANNELS[b[offset:offset+2]]``)."""
    if b[offset:offset + 2] not in _NETPBM_CHANNELS:
        raise ValueError("not a binary netpbm (P5/P6) payload")
    pos = offset + 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and b[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed netpbm header")
        vals.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    return w, h, maxval, pos


def ppm_decode(b: bytes) -> np.ndarray:
    """Binary netpbm bytes -> uint8 array: (h, w, 3) for P6 RGB,
    (h, w) for P5 grayscale."""
    w, h, _maxval, pos = _ppm_header(b)
    ch = _NETPBM_CHANNELS[b[:2]]
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=pos)
    return raster.reshape(h, w, ch) if ch == 3 else raster.reshape(h, w)


def ppm_encode(arr: np.ndarray) -> bytes:
    """uint8 array -> binary netpbm bytes (maxval 255): (h, w, 3) -> P6,
    (h, w) -> P5.  Any other shape (RGBA, (h, w, 1), 1-D) is rejected
    loudly — a mislabeled magic would silently corrupt the raster."""
    if not (arr.ndim == 2 or (arr.ndim == 3 and arr.shape[2] == 3)):
        raise ValueError(
            f"expected (h, w) grayscale or (h, w, 3) RGB, got {arr.shape}"
        )
    h, w = arr.shape[:2]
    magic = b"P6" if arr.ndim == 3 else b"P5"
    return magic + b"\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def ppm_resize_nn(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index mapping
    (src = floor(dst * src_extent / dst_extent))."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]


def ppm_stream_frames(b: bytes) -> list[tuple[int, int]]:
    """Concatenated binary-netpbm stream (``ffmpeg -f image2pipe -vcodec
    ppm`` / ``-pix_fmt gray``) -> [(offset, length)] per frame.  Frames
    may mix P5/P6 (each frame's magic decides its raster size)."""
    frames = []
    pos = 0
    while pos < len(b):
        w, h, _maxval, raster = _ppm_header(b, pos)
        end = raster + w * h * _NETPBM_CHANNELS[b[pos:pos + 2]]
        if end > len(b):
            raise ValueError("truncated netpbm frame in stream")
        frames.append((pos, end - pos))
        pos = end
    return frames


def wav_info(b: bytes) -> dict:
    """RIFF/WAVE header parse -> {channels, sample_rate, frames}.
    PCM frame count = data-chunk size / block align (public RIFF spec);
    walks chunks, so fmt/data need not be adjacent."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    channels = sample_rate = block_align = None
    data_size = None
    while pos + 8 <= len(b):
        cid, size = b[pos:pos + 4], struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if cid == b"fmt ":
            channels, sample_rate = struct.unpack("<HI", b[pos + 10:pos + 16])
            block_align = struct.unpack("<H", b[pos + 20:pos + 22])[0]
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if block_align in (None, 0) or data_size is None:
        raise ValueError("missing fmt/data chunk")
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "frames": data_size // block_align,
    }

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source_ref", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("fingerprint", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("frames", IntegerType(), True),
    ]
)


def _decode_payload(kind: str, payload: bytes | None) -> dict:
    """Decode one payload -> feature dict.

    REAL paths (magic-byte dispatch): P6 PPM images, concatenated-P6 video
    streams, RIFF/WAVE audio.  Anything else falls back to the deterministic
    fake features (md5 arithmetic) so unsupported formats still flow through
    the pipeline with stable values — swap the fallback branch for
    PIL/libvips (image), soundfile (audio) or pyav (video) on a cluster that
    has them.  Raises for unknown kinds, mirroring how a real codec path
    would reject unsupported media.
    """
    import hashlib

    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media kind: {kind}")
    b = payload or b""
    h = hashlib.md5(b).hexdigest()
    feats = {"n_bytes": len(b), "fingerprint": h, "width": None, "height": None,
             "frames": None}
    if kind == "image" and b[:2] in _NETPBM_CHANNELS:
        w, hh, _maxval, _pos = _ppm_header(b)
        feats["width"], feats["height"] = w, hh
        return feats
    if kind == "video" and b[:2] in _NETPBM_CHANNELS:
        frames = ppm_stream_frames(b)
        w, hh, _maxval, _pos = _ppm_header(b, frames[0][0])
        feats["width"], feats["height"] = w, hh
        feats["frames"] = len(frames)
        return feats
    if kind == "audio" and b[:4] == b"RIFF":
        feats["frames"] = wav_info(b)["frames"]
        return feats
    # fallback: deterministic fake features (documented stub seam)
    seed = int(h[:8], 16)
    if kind == "image":
        feats["width"] = 16 + seed % 2048
        feats["height"] = 16 + (seed // 2048) % 2048
    elif kind == "video":
        feats["width"] = 16 + seed % 1920
        feats["height"] = 16 + (seed // 1920) % 1080
        feats["frames"] = 1 + seed % 7200
    else:  # audio
        feats["frames"] = 1 + seed % 480000
    return feats


def decode_media(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas decode pass: one Arrow batch in, one feature batch out.
    Binary payloads never round-trip through Python row objects — only
    Arrow buffers."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(k, p)
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out[[f.name for f in DECODED_SCHEMA.fields]]

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def fetch_media_stub(docs: DataFrame) -> DataFrame:
    """Resolve docs' media refs into the media table shape.  The stub
    synthesizes payload bytes from the ref itself (deterministic); a real
    deployment would read object storage here (still inside the executor).
    """
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .select(F.col("s.media_ref").alias("source_ref"))
        .distinct()
    )
    return refs.select(
        F.md5("source_ref").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("source_ref"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        "source_ref",
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """mapInPandas resize pass for image rows: -> (media_id, width, height,
    payload).

    P6 PPM payloads get a REAL nearest-neighbor resize (NumPy index
    mapping) and come back as valid P6 bytes of the target box.  Other
    formats keep the deterministic stub payload (md5 of input bytes +
    target box) — swap that branch for PIL.Image.resize/libvips thumbnail
    where those libraries exist; the Arrow plumbing is identical.
    """
    import hashlib

    def _resize_one(p: bytes | None) -> bytes:
        b = p or b""
        if b[:2] in _NETPBM_CHANNELS:
            return ppm_encode(ppm_resize_nn(ppm_decode(b), target_w, target_h))
        return hashlib.md5(b + f"|{target_w}x{target_h}".encode()).digest()

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            out_payload = [_resize_one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": target_w,
                    "height": target_h,
                    "payload": out_payload,
                }
            )

    return media.mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 30, max_frames: int = 8
                  ) -> DataFrame:
    """mapInPandas frame sampler for video rows — a 1->N batch expansion
    (the Arrow-batch analog of a generator/UDTF): every ``every_n``-th
    frame up to ``max_frames`` per video.

    Concatenated-P6 streams get REAL extraction: each emitted payload is
    the actual standalone P6 frame sliced from the stream.  Other container
    formats keep the deterministic stub bytes per (video, frame_no) — swap
    that branch for pyav/ffmpeg where available.
    """
    import hashlib

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            ids, nos, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = p or b""
                if b[:2] in _NETPBM_CHANNELS:
                    spans = ppm_stream_frames(b)
                    for i, fno in enumerate(range(0, len(spans), every_n)):
                        if i >= max_frames:
                            break
                        off, ln = spans[fno]
                        ids.append(mid)
                        nos.append(fno)
                        payloads.append(b[off:off + ln])
                    continue
                n_frames = _decode_payload("video", p)["frames"]
                for i, fno in enumerate(range(0, n_frames, every_n)):
                    if i >= max_frames:
                        break
                    ids.append(mid)
                    nos.append(fno)
                    payloads.append(
                        hashlib.md5(b + f"|f{fno}".encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "payload": payloads}
            )

    return media.mapInPandas(frame_batches, FRAME_SCHEMA)


def wav_pcm_stats(b: bytes) -> dict:
    """Sample-level stats for a 16-bit PCM RIFF/WAVE payload ->
    {rms, peak, duration_s}: vectorized NumPy over the raw data chunk
    (no audio library needed for canonical PCM).  ``rms``/``peak`` are
    normalized to [-1, 1] full scale; raises for non-PCM or non-16-bit
    payloads (the documented seam: swap in ``soundfile`` for compressed
    codecs on a cluster that has it)."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", b[pos + 8:pos + 24])
        elif cid == b"data":
            data = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, _ch, sample_rate, _br, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"not 16-bit PCM (format={audio_format}, bits={bits})")
    x = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    if x.size == 0:
        return {"rms": 0.0, "peak": 0.0,
                "duration_s": 0.0}
    xf = x.astype(np.float64) / 32768.0
    return {
        "rms": float(np.sqrt(np.mean(xf * xf))),
        "peak": float(np.max(np.abs(xf))),
        "duration_s": float(
            (len(data) // block_align) / sample_rate
        ),
    }


def ppm_pixel_stats(b: bytes) -> dict:
    """Pixel-level stats for a P6 PPM payload -> {mean_r, mean_g,
    mean_b, luma_mean, luma_std}: vectorized NumPy over the raster
    (Rec.601 luma weights).  The per-image feature vector behind
    brightness/contrast curation filters — an all-black or blown-out
    image is as useless to training as boilerplate text."""
    import numpy as np

    arr = ppm_decode(b)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("pixel stats need a 3-channel P6 raster")
    xf = arr.astype(np.float64)
    luma = 0.299 * xf[..., 0] + 0.587 * xf[..., 1] + 0.114 * xf[..., 2]
    return {
        "mean_r": float(xf[..., 0].mean()),
        "mean_g": float(xf[..., 1].mean()),
        "mean_b": float(xf[..., 2].mean()),
        "luma_mean": float(luma.mean()),
        "luma_std": float(luma.std()),
    }
