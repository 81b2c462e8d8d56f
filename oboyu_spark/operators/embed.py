"""Embedding generation at index time (reference: the indexer's
embedding pipeline, src/oboyu/indexer/ — model inference over document
batches, persisted next to the index; HNSW at schema.py:264-289).

The reference embeds with a sentence-transformers model. No model
runtime exists in this container, so this operator ships the SPARK
SHAPE of the problem — the part that matters at 100 TB — with two
backends:

- ``model="hashing"`` (default, always available): a deterministic
  md5-derived pseudo-embedding, bit-reproducible across engines
  (value_d = md5_u32(text ':' d) / 2^31 − 1, then an IEEE float32
  round-trip) — this is what makes the operator exact-oracle checkable
  in DuckDB, not just rows-only.
- ``model="sentence-transformers"``: the real-model slot, gated behind
  an import-try that raises loudly (the same degradation contract as
  functions/janorm).

The execution shape is the one a real model needs and the one
multimodal.py already pins: ``mapInPandas`` with the ITERATOR
contract — the backend initializes ONCE per python worker in the
generator prologue (a sentence-transformer load is seconds; paying it
per Arrow batch would dominate), then encodes batch-by-batch. Output
partitioning follows the input; no shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_embed_batch(texts: pd.Series, dim: int) -> list[list[float]]:
    """Deterministic pseudo-embedding: per dimension d,
    u32(md5(text ':' d)[:8 hex]) / 2^31 − 1 ∈ [−1, 1). Every step is
    exact in float64 (integer < 2^32, division by a power of two), and
    the final float32 cast is the same IEEE round-to-nearest in numpy
    and DuckDB's ::FLOAT — so the DuckDB oracle reproduces the values
    bit-for-bit."""
    out = []
    for t in texts:
        t = t or ""
        vals = np.empty(dim, dtype=np.float64)
        for d in range(dim):
            h = hashlib.md5(f"{t}:{d}".encode("utf-8")).hexdigest()
            vals[d] = int(h[:8], 16) / 2147483648.0 - 1.0
        out.append([float(x) for x in vals.astype(np.float32)])
    return out


def embed_docs(
    docs: DataFrame,
    dim: int = 64,
    model: str = "hashing",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, embedding array<float>) via mapInPandas.

    ``model="hashing"`` needs no libraries; any other value names a
    sentence-transformers model and raises ImportError here (runtime
    absent) — the iterator prologue below is where it would load, once
    per executor python worker."""
    if model != "hashing":
        try:  # pragma: no cover - not installed in this container
            import sentence_transformers  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                f"model={model!r} needs sentence-transformers on the "
                "executors — only the deterministic 'hashing' backend "
                "is available in this environment"
            ) from exc
        raise NotImplementedError  # pragma: no cover — real-model slot

    id_field = docs.schema[id_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "embedding array<float>"
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # prologue: backend init happens HERE, once per worker —
        # the hashing backend has nothing to load, a real model would
        encode = _hash_embed_batch
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": encode(pdf[text_col], dim),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(_embed, out_schema)


def embedding_rows(
    docs: DataFrame,
    dim: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """embed_docs exploded to one (doc_id, dim_idx, value) row per
    dimension — the driver-hashable projection (array cells error the
    driver canonicalizer) and the exact-oracle surface."""
    e = embed_docs(docs, dim, "hashing", id_col, text_col)
    return e.select(
        id_col,
        F.posexplode("embedding").alias("dim_idx", "value"),
    ).select(
        id_col,
        "dim_idx",
        F.round(F.col("value").cast("double"), round_digits).alias("value"),
    )
