"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side machinery — schema, batch iteration, partition sizing,
metadata propagation — is real and tested.  The actual codec work (image
decode, resampling, frame extraction) is STUBBED: the sandbox has no
imaging/audio libraries, so ``decode_media`` ships a deterministic fake
"decoder" (shape/fingerprint derived from the bytes) behind the same UDF
signature a real libvips/ffmpeg-backed implementation would use; swap
``_decode_payload`` for the real library call on a cluster that has it.

Media references from the docs model (``media`` spans / ``media_ref``
pointers like ``aln://db/batch001.pairwise#hit``) resolve through
``fetch_media_stub`` the same way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

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
    """STUB decoder — deterministic fake features from the raw bytes.

    A real deployment replaces this body with PIL/libvips (image), soundfile
    (audio) or pyav (video) calls; the surrounding Arrow plumbing is
    unchanged.  Raises for unknown kinds, mirroring how a real codec path
    would reject unsupported media.
    """
    import hashlib

    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media kind: {kind}")
    b = payload or b""
    h = hashlib.md5(b).hexdigest()
    seed = int(h[:8], 16)
    feats = {"n_bytes": len(b), "fingerprint": h, "width": None, "height": None,
             "frames": None}
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
    payload).  Plumbing (Arrow batches, binary in/out, schema) is real; the
    pixel work is the STUB — a real build swaps the body for
    PIL.Image.resize/libvips thumbnail.  The stub emits a deterministic
    payload (md5 of input bytes + target box) so downstream stages and
    tests have stable bytes to check.
    """
    import hashlib

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            out_payload = [
                hashlib.md5(
                    (p or b"") + f"|{target_w}x{target_h}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
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
    frame up to ``max_frames`` per video.  Frame extraction itself is the
    STUB (deterministic bytes per (video, frame_no)); a real build calls
    pyav/ffmpeg inside the same batch loop.
    """
    import hashlib

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            ids, nos, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames = _decode_payload("video", p)["frames"]
                for i, fno in enumerate(range(0, n_frames, every_n)):
                    if i >= max_frames:
                        break
                    ids.append(mid)
                    nos.append(fno)
                    payloads.append(
                        hashlib.md5((p or b"") + f"|f{fno}".encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "payload": payloads}
            )

    return media.mapInPandas(frame_batches, FRAME_SCHEMA)
