"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with a typed metadata struct, and run
decode / feature-extraction as Arrow-batched ``mapInPandas`` stages.

The test corpus has no real media, so the *payload* here is the
document text encoded to bytes — but every piece of Spark plumbing a
real media pipeline needs is genuine and tested: binary column
construction, content addressing (sha256), typed metadata structs,
format sniffing on magic bytes, and a ``mapInPandas`` featurizer with
a declared output schema operating on Arrow record batches. The
actual image/audio decode is stubbed behind ``NotImplementedError``
(decode libs are not in this container) with a deterministic fake
featurizer exercising the identical batch path.

Scale notes:
- Binary payloads ride through the plan as opaque bytes; all metadata
  needed for pruning (mime, byte_len, content hash) is *materialized
  as columns*, so filters on them push down to the parquet scan and
  a 100 TB media table is pruned before any decode runs.
- ``mapInPandas`` processes Arrow batches (not rows); batch size is
  governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``. The
  featurizer is the only Python in the engine's hot paths, and it is
  batch-vectorized by construction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Magic-byte prefixes for format sniffing (public file signatures).
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("474946", "image/gif"),
    ("494433", "audio/mpeg"),
    ("fff1", "audio/aac"),
    ("1a45dfa3", "video/webm"),
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Payload = utf-8 bytes of the text (deterministic stand-in for real
    media bytes). Metadata: byte length, sha256 content address, and a
    sniffed mime (text/plain here — the sniff expression is the real
    one, matching on hex magic prefixes).
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    hexhead = F.lower(F.hex(F.substring(payload, 1, 8)))
    mime = F.lit("application/octet-stream")
    for prefix, m in reversed(MAGIC_PREFIXES):
        mime = F.when(hexhead.startswith(prefix), F.lit(m)).otherwise(mime)
    # utf-8 text payloads: printable ASCII head -> text/plain
    mime = F.when(hexhead.rlike("^[2-7][0-9a-f]"), F.lit("text/plain")).otherwise(mime)
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("byte_len"),
            F.sha2(payload, 256).alias("content_sha256"),
            mime.alias("mime"),
        ).alias("media_meta"),
    )


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling over opaque binary payloads: split the payload
    into fixed-size frames, keep every ``every_n``-th — the video
    frame-sample access pattern with the decode stubbed (frames are
    byte slices; a real deployment decodes them downstream).

    Pure SQL on binary (substring is 1-indexed on bytes), map-only:
    at scale this is the cheap pre-decode reduction that keeps the
    expensive decode stage at 1/every_n of the data.
    """
    frames = F.expr(
        f"transform(sequence(0, cast(ceil(media_meta.byte_len / {frame_bytes}) as int) - 1, {every_n}), "
        f"  i -> substring(payload, i * {frame_bytes} + 1, {frame_bytes}))"
    )
    return df.select(
        F.col(id_col),
        F.col("media_meta.byte_len").alias("byte_len"),
        frames.alias("frames"),
    ).select(
        F.col(id_col),
        F.size("frames").cast("long").alias("n_sampled_frames"),
        F.sha2(F.element_at("frames", 1), 256).alias("first_frame_sha256"),
        F.aggregate(
            F.expr("transform(frames, f -> length(f))"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sampled_bytes"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_bytes", T.ArrayType(T.LongType())),
        T.StructField("mime", T.StringType()),
    ]
)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
    ]
)


def resize_images(
    df: DataFrame, out_w: int = 32, out_h: int = 32, decode: bool = False
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage — the
    batch shape, output schema (binary payload out, typed dims), and
    partition behavior of a real thumbnailing pass.

    ``decode=False`` (default) runs the deterministic stand-in: the
    payload is nearest-neighbor "resampled" at the byte level to
    exactly ``out_w*out_h`` bytes (stride sampling — the same
    index-arithmetic a pixel resize does, applied to the opaque
    bytes), so output size, determinism, and the binary-out column
    are all real and testable. ``decode=True`` is the real
    PIL/libvips path and raises ``NotImplementedError`` in this
    container; a deployment replaces only the inner function.

    Scale: resize output is a new binary column sized out_w*out_h —
    the write amplification is declared up front, and the stage is
    map-only (no shuffle), so it pipelines with the scan.
    """

    def do_resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # local import: runs on executors

        n_out = out_w * out_h

        def stride_sample(b: bytes) -> bytes:
            b = bytes(b)
            if not b:
                return bytes(n_out)
            # nearest-neighbor index arithmetic over the byte "pixels"
            return bytes(b[(i * len(b)) // n_out] for i in range(n_out))

        for pdf in batches:
            if decode:
                raise NotImplementedError(
                    "real image resize requires PIL/libvips, not present in "
                    "this container; install and replace this branch"
                )
            payloads = pdf["payload"]
            out = payloads.map(stride_sample)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": out.map(len).astype("int64"),
                    # deterministic content witness: the value-hash
                    # oracle can recompute it from the source bytes
                    "byte_checksum": out.map(lambda b: sum(b)).astype("int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def extract_features(
    df: DataFrame, decode: bool = False, head_n: int = 8
) -> DataFrame:
    """Arrow-batched featurizer over binary payloads (``mapInPandas``).

    ``decode=False`` (default) runs the deterministic fake featurizer:
    byte length + first ``head_n`` byte values — real Arrow plumbing,
    fake features. ``decode=True`` is the real-decode path and raises
    ``NotImplementedError`` (image/audio libraries are not available
    in this environment); a deployment with PIL/torchaudio installed
    replaces only the inner function.
    """

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # local import: runs on executors

        for pdf in batches:
            if decode:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this container; install them and replace this branch"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "head_bytes": payloads.map(
                        lambda b: [int(x) for x in bytes(b)[:head_n]]
                    ),
                    "mime": pdf["mime"],
                }
            )

    src = df.select(
        "doc_id", "payload", F.col("media_meta.mime").alias("mime")
    )
    return src.mapInPandas(featurize, schema=FEATURE_SCHEMA)
