"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.
The decode/feature kernels are STUBBED (the container has no image/audio
libraries — clearly marked below); everything Spark-side is real and
tested: schema, Arrow batch shape, mapInPandas signatures, partitioning.

At 100 TB the rules are: (1) never explode binary through a shuffle you
don't need — decode before aggregating, project metadata early; (2) use
``mapInPandas`` with Iterator[pd.DataFrame] so one Python worker streams
record batches (bounded memory) instead of materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


# Real PNG plumbing for the synthetic image payloads: an 8-byte signature
# + a 25-byte IHDR chunk (length, "IHDR", width/height as big-endian u32,
# bit depth 8 / color type 6 / three zero bytes, then a zeroed CRC — the
# fixture parser reads dimensions, it does not verify CRCs). 33 bytes total.
PNG_SIG_HEX = "89504E470D0A1A0A"
_IHDR_PRE_HEX = "0000000D49484452"  # chunk length 13 + "IHDR"
_IHDR_POST_HEX = "080600000000000000"  # depth/color/c/f/i + zero CRC
PNG_HEADER_BYTES = 33


def png_header(width, height):
    """Column expression: a real PNG signature+IHDR for (width, height) —
    built JVM-side from hex literals + lpad(hex(int)) big-endian u32s."""
    return F.unhex(
        F.concat(
            F.lit(PNG_SIG_HEX + _IHDR_PRE_HEX),
            F.lpad(F.hex(width), 8, "0"),
            F.lpad(F.hex(height), 8, "0"),
            F.lit(_IHDR_POST_HEX),
        )
    )


def synthesize_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table from a text corpus. Image payloads
    carry a REAL PNG signature + IHDR header (width = id%512+16,
    height = id%384+16) followed by the text bytes, so the image feature
    kernel exercises real byte-level header parsing and its output is
    SQL-oracle-checkable against the datagen formula; audio/video payloads
    are the raw UTF-8 text bytes (their decoders stay stubbed — no
    ffmpeg/audio libs in this container)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col(id_col), 3) + 1).cast("int"),
    )
    body = F.encode(F.col(text_col), "utf-8")
    width = (F.pmod(F.col(id_col), 512) + 16).cast("int")
    height = (F.pmod(F.col(id_col), 384) + 16).cast("int")
    payload = F.when(kind == "image", F.concat(png_header(width, height), body)).otherwise(body)
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
    )


def parse_image_header(payload: bytes) -> tuple[int, int] | None:
    """REAL image header parsing, pure Python (no PIL needed for
    dimensions): PNG (IHDR big-endian u32 pair at offset 16) and GIF87a/
    GIF89a (little-endian u16 pair at offset 6). Returns None when the
    payload is not a recognizable image — callers fall back to the stub."""
    import struct

    if len(payload) >= 24 and payload[:8] == bytes.fromhex(PNG_SIG_HEX):
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    return None


def _decode_stub(payload: bytes, kind: str) -> tuple[int, int]:
    """STUB decode for audio/video (and unparseable images): real decoding
    requires ffmpeg/audio libs, absent in this container. Deterministic
    fake: derive (width, height) from the payload length so tests are
    stable. Replace with a real decoder by swapping this function only —
    the Spark plumbing stays identical."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: Arrow delivers ``payload`` as object-dtype bytes; the
    checksum (md5) is computed Python-side to mimic a real kernel's cost
    profile. Image width/height come from REAL header parsing
    (parse_image_header); audio/video from the stub."""

    from ..packaging import ensure_shipped

    ensure_shipped(media.sparkSession)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def dims(p: bytes, k: str) -> tuple[int, int]:
            if k == "image":
                parsed = parse_image_header(p)
                if parsed is not None:
                    return parsed
            return _decode_stub(p, k)

        for pdf in batches:
            wh = [dims(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array([w for w, _ in wh], dtype="int32"),
                    "height": pd.array([h for _, h in wh], dtype="int32"),
                    "checksum": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(media: DataFrame, max_bytes: int) -> DataFrame:
    """Resize/transcode stand-in as a PURE Column rewrite: truncate the
    payload to ``max_bytes`` (substring slices bytes on BinaryType) and
    update the size metadata. A real resize is a Pandas-UDF payload
    rewrite with the same shape — but truncation needs no Python at all,
    so it stays JVM-side (UDFs are the slow path)."""
    resized = F.substring(F.col("payload"), 1, max_bytes)
    return media.withColumns(
        {"payload": resized, "n_bytes": F.octet_length(resized).cast("long")}
    )


def _frame_stub(payload: bytes, i: int, k: int) -> bytes:
    """STUB frame extraction (no ffmpeg in this container): frame i of k
    = every k-th byte starting at offset i — deterministic, so the byte
    accounting is oracle-checkable; swap for a real decoder without
    touching the Spark plumbing."""
    return payload[i::k]


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: 1 video row → ``n_frames`` frame rows via
    mapInPandas (the row-explosion batch shape a real video pipeline
    needs; Arrow streams bounded batches both ways). Non-video rows are
    filtered JVM-side before the crossing."""
    from ..packaging import ensure_shipped

    ensure_shipped(media.sparkSession)
    vids = media.filter(F.col("kind") == "video").select("media_id", "payload")

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "frame_idx": [], "payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["payload"].append(_frame_stub(payload, i, n_frames))
            frame = pd.DataFrame(out)
            frame["frame_idx"] = frame["frame_idx"].astype("int32")
            frame["n_bytes"] = frame["payload"].map(len).astype("int64")
            yield frame

    return vids.mapInPandas(explode_frames, schema=FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — binary column pruned from the scan."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
    )
