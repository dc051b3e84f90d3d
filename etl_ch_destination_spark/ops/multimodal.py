"""Multimodal column handling (SURVEY §2.10 `llm_multimodal_ingest`;
north-star "multimodal columns").

Model: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (SURVEY §1.1). Production ingest uses
``spark.read.format("binaryFile")`` over an object-store prefix; the
fixture environment has no binary corpus, so ``synthesize_binary``
derives deterministic bytes from ``documents.text`` (UTF-8 encode) —
the Spark-side plumbing (schema, Arrow batching, UDF signature) is
identical either way.

Feature extraction runs as ``mapInPandas`` — Arrow-batched, one Python
worker per task, linear scan, no shuffle. Real decoders (PIL/librosa/
ffmpeg) are NOT available in this container; ``decode_image`` is an
explicit stub (NotImplementedError) and ``extract_features`` computes
deterministic byte-level features so the pipeline shape is fully
testable. At 100 TB: binary payloads dominate I/O — partition by
content-defined prefix, keep features narrow, never collect payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEATURE_SCHEMA = "doc_id long, n_bytes int, first_byte int, content_md5 string"


def synthesize_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """documents.text → (doc_id, content binary, meta struct) — the
    stand-in for a binaryFile scan (path/modificationTime/length/content)."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit("text/synthetic").alias("modality"),
            F.octet_length(content).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding requires PIL/opencv, not present in this
    container. The Arrow plumbing around it (extract_features) is real."""
    raise NotImplementedError(
        "image decode requires an imaging library not available in this environment"
    )


def resize_image(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize via mapInPandas — plumbing-real,
    decode-stubbed.

    Real pipeline: decode → resample to (width, height) → re-encode.
    The codec is not available in this container, so the payload
    transform is a deterministic fake (truncate/cycle the source bytes
    to exactly width*height bytes — stable, size-correct, testable);
    the schema, metadata struct update, batch shape, and partition
    behavior are production-identical. Output meta records the target
    dims so downstream feature extractors can trust the shape.
    """
    target = width * height

    def do_resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def fake_resample(b: bytes) -> bytes:
            # Deterministic stand-in for decode→resample→encode: cycle
            # source bytes to the exact target payload size.
            if not b:
                return bytes(target)
            reps = -(-target // len(b))  # ceil division
            return (b * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"].map(fake_resample),
                    "width": width,
                    "height": height,
                    "orig_bytes": pdf["content"].map(len).astype("int64"),
                }
            )

    return binary_df.mapInPandas(
        do_resize, "doc_id long, content binary, width int, height int, orig_bytes long"
    )


def sample_frames(
    binary_df: DataFrame, frame_bytes: int = 64, every_nth: int = 10
) -> DataFrame:
    """Arrow-batched video frame sampling via mapInPandas: treat the
    payload as a stream of fixed-size frames, keep every Nth, and
    explode to one output row per kept frame.

    Real pipeline: demux → decode keyframes → sample. The demuxer is
    not in this container, so "frames" are fixed-size byte windows —
    the output cardinality, frame indexing, row-explosion shape, and
    the 1:N mapInPandas batch contract are production-identical. At
    100 TB this stage dominates I/O: it runs as a narrow map over the
    binary scan, no shuffle, and emits only the kept frames (never the
    full payload) downstream.
    """

    def do_sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, fidx, frames = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n_frames = len(content) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    fidx.append(i)
                    frames.append(content[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(fidx, dtype="int32"),
                 "frame": pd.Series(frames, dtype=object)}
            )

    return binary_df.mapInPandas(
        do_sample, "doc_id long, frame_idx int, frame binary"
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched per-payload feature extraction via mapInPandas.

    Features are deterministic byte-level stand-ins (size, first byte,
    content hash) for the real decode→embed step; the batch shape,
    schema, and partition behavior are production-identical.
    """

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": content.map(len).astype("int32"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "content_md5": content.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(featurize, FEATURE_SCHEMA)
