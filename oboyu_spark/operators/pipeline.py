"""Corpus-preparation pipeline: the composition a training-data run
executes over raw documents before indexing/embedding at scale —
exact dedup → near dedup → quality filter → chunk → embed.

Every stage is an existing operator of this package (dedup.py,
textstats.py, chunker.py, embed.py); this module only wires them with
explicit, documented keep/drop policies. The composition stays LAZY —
one logical plan per output — so Catalyst fuses the filter stages into
the scans and nothing is materialized until the caller writes or
counts. jobs/prepare_corpus.py is the spark-submit wrapper.

Stage policies (the parts that are a decision, not a mechanism):

- exact: keep the min-id document per whitespace-normalized md5
  fingerprint (dedup.dedup_exact).
- near (``near_policy="greedy"``, default): MinHash+LSH candidate
  pairs at ``near_threshold`` estimated Jaccard; DROP the higher id
  of every pair. Greedy pair-based removal over-removes on chains
  (a~b, b~c drops b and c even when a≁c) and under-removes on stars
  sharing a high-id hub.
- near (``near_policy="components"``): connected components over the
  pair graph (dedup.connected_components, min-label propagation to a
  fixpoint), keep exactly ONE representative — the min id — per
  component. Deterministic cluster semantics: every near-dup cluster
  survives exactly once regardless of its edge shape.
- near (``near_method="winnow"``): pairs from winnowing
  fingerprints thresholded on containment overlap instead of
  MinHash Jaccard — the local shared-run lens; composes with either
  policy above.
- quality: keep documents with textstats.quality_score >=
  ``min_quality`` (composite length/punctuation/word-shape heuristic,
  deterministic column expression).
- language: keep documents whose textstats.language_id is in
  ``langs`` (ja/en/und heuristic) — the wrong-language cut every
  monolingual training corpus applies.

100 TB shape: exact dedup is one hash-aggregate; near dedup is the
bucketed band join (no full cross product); quality is a zero-shuffle
column predicate fused into the scan; chunking is posexplode over a
pandas UDF; embedding is mapInPandas with per-worker model init. No
stage collects to the driver.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def near_dup_drop_ids(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    policy: str = "greedy",
    method: str = "minhash",
    winnow_k: int = 8,
    winnow_window: int = 4,
    winnow_max_fp_df: int | None = 1000,
    simhash_max_hamming: int = 6,
    simhash_max_bucket_df: int | None = 1000,
) -> DataFrame:
    """Ids to drop at >= ``threshold`` similarity.

    ``method="minhash"`` (default): MinHash+LSH candidate pairs,
    threshold on the signature-estimated Jaccard — the global
    bag-of-shingles lens. ``method="winnow"``: winnowing-fingerprint
    pairs, threshold on containment-style overlap (common fingerprints
    / min set size) — the LOCAL shared-run lens, which catches a long
    copied passage inside otherwise-different documents that Jaccard
    dilutes below any sane threshold. ``method="simhash"``: 64-bit
    SimHash pairs within ``simhash_max_hamming`` — the tf-WEIGHTED
    whole-document lens (one hash aggregate, no shingle explosion;
    ``threshold`` is unused, the hamming budget is the cut), the
    cheapest pass for boilerplate-heavy web corpora.

    ``policy="greedy"``: every ``doc_b`` of a pair (doc_a < doc_b by
    construction). ``policy="components"``: every non-representative
    member of a connected component of the pair graph (representative
    = min id per component)."""
    from .dedup import (
        connected_components, minhash_lsh_pairs, simhash64_near_pairs,
        winnow_near_pairs,
    )

    if method == "minhash":
        pairs = minhash_lsh_pairs(docs, num_perm=num_perm, bands=bands,
                                  threshold=threshold, n=n,
                                  id_col=id_col, text_col=text_col)
    elif method == "winnow":
        pairs = winnow_near_pairs(
            docs, k=winnow_k, window=winnow_window, min_common=1,
            id_col=id_col, text_col=text_col,
            max_fp_df=winnow_max_fp_df,
        ).filter(F.col("overlap") >= threshold).select("doc_a", "doc_b")
    elif method == "simhash":
        pairs = simhash64_near_pairs(
            docs, max_hamming=simhash_max_hamming, id_col=id_col,
            text_col=text_col, max_bucket_df=simhash_max_bucket_df,
        ).select("doc_a", "doc_b")
    else:
        raise ValueError(
            f"method={method!r} not in ('minhash', 'winnow', 'simhash')")
    if policy == "greedy":
        return pairs.select(F.col("doc_b").alias(id_col)).distinct()
    if policy == "components":
        cc = connected_components(pairs)
        return cc.filter(F.col("doc_id") != F.col("component")) \
                 .select(F.col("doc_id").alias(id_col))
    raise ValueError(f"policy={policy!r} not in ('greedy', 'components')")


def apply_pii_stage(
    out: DataFrame,
    max_pii_count: Optional[int],
    pii_kinds: "Optional[tuple[str, ...]]",
    text_col: str = "text",
) -> DataFrame:
    """PII density gate and/or scrub, as one stage.

    - gate (``max_pii_count``, VERDICT r6 #6): a page riddled with
      emails / phone numbers / card numbers is a contact dump or a
      leak, not prose — DROP it rather than publish a mask-riddled
      text. Counted on the ORIGINAL text (before any redaction); a
      stateless scan-fused predicate.
    - scrub (``pii_kinds``): a stateless text REWRITE
      (regexp_replace chain + Luhn-checked card-number fold).

    When BOTH run (r8, VERDICT r7 #4), the Luhn-checked card match
    list of the original text is hoisted into ONE projected column
    consumed by gate and scrub, so the candidate regexp scan +
    checksum fold runs once per row instead of once per consumer."""
    if max_pii_count is not None and pii_kinds is not None:
        from .textstats import (
            credit_card_matches, pii_match_count, redact_pii,
        )

        c = F.col(text_col)
        # the always-true branch is value-neutral but marks the
        # hoisted column NON-deterministic, which stops
        # PushPredicateThroughNonJoin (whose guard is on the PROJECT
        # fields' determinism) from re-inlining the __cc alias into
        # the gate filter — without it the optimizer undoes the hoist
        # and the card scan + Luhn fold runs twice per row again
        # (guide §4.4: mark expensive expressions non-deterministic to
        # stop the optimizer duplicating them). spark_partition_id()
        # rather than rand(): Spark 4's OptimizeRand rule folds
        # constant-bounded rand comparisons away, un-marking the
        # column. Blocking pushdown here is itself harmless-to-good:
        # pushing the gate below the earlier stages would re-evaluate
        # it on rows they are about to drop.
        cc_once = F.when(F.spark_partition_id() >= -1,
                         credit_card_matches(c))
        return (
            out.withColumn("__cc", cc_once)
            .filter(
                pii_match_count(c, cc_matches=F.col("__cc"))
                <= max_pii_count
            )
            .withColumn(
                text_col,
                redact_pii(
                    c, pii_kinds,
                    cc_matches=(F.col("__cc")
                                if "credit_card" in pii_kinds else None),
                ),
            )
            .drop("__cc")
        )
    if max_pii_count is not None:
        from .textstats import pii_match_count

        return out.filter(
            pii_match_count(F.col(text_col)) <= max_pii_count
        )
    if pii_kinds is not None:
        from .textstats import redact_pii

        return out.withColumn(text_col,
                              redact_pii(F.col(text_col), pii_kinds))
    return out


def prepare_corpus(
    docs: DataFrame,
    exact: bool = True,
    near_threshold: Optional[float] = 0.5,
    near_num_perm: int = 16,
    near_bands: int = 4,
    near_n: int = 3,
    near_policy: str = "greedy",
    near_method: str = "minhash",
    near_winnow_max_fp_df: Optional[int] = 1000,
    near_simhash_max_hamming: int = 6,
    min_quality: Optional[float] = None,
    max_dup_line_frac: Optional[float] = None,
    max_top_bigram_frac: Optional[float] = None,
    max_pii_count: Optional[int] = None,
    pii_kinds: "Optional[tuple[str, ...]]" = None,
    langs: "Optional[tuple[str, ...]]" = None,
    chunk_size: Optional[int] = 1024,
    chunk_overlap: int = 256,
    embed_dim: Optional[int] = None,
    embed_model: str = "hashing",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, Any]:
    """Compose the preparation stages over ``docs``.

    Returns lazy DataFrames: ``{"docs": cleaned documents,
    "chunks": chunked rows or None, "embeddings": chunk embeddings or
    None}``. Pass ``near_threshold=None`` / ``min_quality=None`` /
    ``chunk_size=None`` / ``embed_dim=None`` to skip a stage.
    Embeddings are computed over CHUNKS when chunking is on (the
    reference embeds chunks, not whole documents), else over docs.

    ``near_policy="components"`` is the exception to the lazy-plan
    rule: the connected-components fixpoint is iterative, so the pair
    graph is materialized (Spark actions run) when this function is
    CALLED, not when the result is consumed."""
    from .chunker import chunk_documents
    from .dedup import dedup_exact
    from .embed import embed_docs
    from .textstats import quality_score

    out = docs
    if exact:
        out = dedup_exact(out, id_col=id_col, text_col=text_col)
    if near_threshold is not None:
        drop = near_dup_drop_ids(out, threshold=near_threshold,
                                 num_perm=near_num_perm, bands=near_bands,
                                 n=near_n, id_col=id_col,
                                 text_col=text_col, policy=near_policy,
                                 method=near_method,
                                 winnow_max_fp_df=near_winnow_max_fp_df,
                                 simhash_max_hamming=near_simhash_max_hamming)
        # no forced broadcast: at web scale the drop set can be a large
        # fraction of the corpus — let AQE pick the join strategy
        out = out.join(drop, id_col, "left_anti")
    if min_quality is not None:
        out = out.filter(quality_score(F.col(text_col)) >= min_quality)
    if max_dup_line_frac is not None or max_top_bigram_frac is not None:
        # repetition gate (Gopher/RefinedWeb-style): like the quality
        # gate, stateless column predicates fused into the scan — drop
        # templated/boilerplate docs whose lines or bigrams repeat
        # beyond the thresholds
        from .textstats import dup_line_frac, top_bigram_frac

        if max_dup_line_frac is not None:
            out = out.filter(
                dup_line_frac(F.col(text_col)) <= max_dup_line_frac
            )
        if max_top_bigram_frac is not None:
            out = out.filter(
                top_bigram_frac(F.col(text_col)) <= max_top_bigram_frac
            )
    out = apply_pii_stage(out, max_pii_count, pii_kinds, text_col)
    if langs is not None:
        # language gate (textstats.language_id heuristic): like the
        # quality gate, a stateless column predicate Catalyst fuses
        # into the scan — zero extra shuffle
        from .textstats import language_id

        out = out.filter(language_id(F.col(text_col)).isin(list(langs)))

    chunks = None
    embeddings = None
    if chunk_size is not None:
        chunks = chunk_documents(out, id_col=id_col, text_col=text_col,
                                 chunk_size=chunk_size,
                                 chunk_overlap=chunk_overlap)
    if embed_dim is not None:
        # chunk_documents always emits a "text" column; un-chunked docs
        # keep the caller's text_col
        target = chunks if chunks is not None else out
        target_id = "chunk_id" if chunks is not None else id_col
        target_text = "text" if chunks is not None else text_col
        embeddings = embed_docs(target, dim=embed_dim, model=embed_model,
                                id_col=target_id, text_col=target_text)
    return {"docs": out, "chunks": chunks, "embeddings": embeddings}
