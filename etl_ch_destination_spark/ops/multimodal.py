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
