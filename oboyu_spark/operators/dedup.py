"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup, all expressed as
declarative DataFrame plans with deliberate scale hygiene:

- hashing uses md5 (identical hex string in Spark and DuckDB → every
  operator here is oracle-checkable cell-exact); a 64-bit xxhash64 fast
  path exists where oracle parity isn't needed
- hot shingles (df > max_shingle_df, finite by default) are dropped
  before any self-join — the classic guard against quadratic pair
  blowup on boilerplate; Jaccard is still verified exactly over the
  candidates' full shingle sets
- the pair joins are equi-joins on (shingle) / (band, key) with the
  a.doc < b.doc triangle filter, i.e. shuffle-partitioned by the join
  key; no crossJoin anywhere
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from .textstats import fingerprint_md5


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(fingerprint, n_docs, keep_doc_id) for every duplicate group."""
    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_md5(F.col(text_col)).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id doc per normalized-content fingerprint."""
    fp = docs.withColumn("fingerprint", fingerprint_md5(F.col(text_col)))
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def shingles_expr(col: Column, n: int = 3,
                  min_token_length: int = 2) -> Column:
    """Distinct word n-gram shingles of the token stream.

    Built as n-fold ``zip_with`` over n shifted slices — NOT
    ``transform(sequence(...), i -> slice(toks, i, n))``: an outer
    array expression captured inside a HOF lambda is RE-EVALUATED per
    element (no CSE inside lambdas), so the old shape re-tokenized the
    document once per shingle — O(tokens²), 244 s for ONE 30k-token
    doc. The slices evaluate the tokenizer n+1 times per row (linear);
    shingle strings are byte-identical ("a b c" either way)."""
    toks = tokens_expr(col, min_token_length)
    n_sh = F.size(toks) - (n - 1)
    parts = [F.slice(toks, i + 1, n_sh) for i in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p,
                            lambda a, b: F.concat(a, F.lit(" "), b))
    # NB: F.sequence(1, 0) DESCENDS — the < n tokens guard also keeps
    # the slice length positive
    grams = F.when(F.size(toks) >= n, joined) \
        .otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def doc_shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text",
                 max_shingle_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) rows; optionally drop boilerplate shingles
    occurring in more than max_shingle_df docs."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_expr(F.col(text_col), n)).alias("shingle"),
    )
    if max_shingle_df:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    return sh


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with set-Jaccard ≥ threshold.

    Scale guard (ON by default): candidate pairs are generated only
    from shingles whose df ≤ ``max_shingle_df`` — the self-join is
    bounded by cap² per shingle instead of being quadratic on
    boilerplate (one shingle shared by 1M docs = 10¹² join rows
    unguarded). Jaccard is then verified EXACTLY over the candidates'
    FULL shingle sets, hot shingles included, so every emitted value is
    the true set-Jaccard. The only approximation is recall: a pair
    whose every shared shingle is hotter than the cap is missed — at a
    near-dup threshold that pair is boilerplate-only overlap by
    definition. ``max_shingle_df=None`` opts out (exhaustive
    self-join; only safe on corpora known to be boilerplate-free).
    """
    sh = doc_shingles(docs, n, id_col, text_col)
    if max_shingle_df:
        # the shingle frame feeds candidate generation, sizes AND the
        # exact-verify joins — persist it so the tokenize+explode
        # lineage runs once, not once per consumer. MEMORY_ONLY on
        # purpose: memory blocks are LRU-evicted (worst case the
        # lineage recomputes), whereas a disk tier would accumulate
        # un-evicted cache files for the application lifetime in a
        # long-lived process calling this over many corpora.
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_ONLY)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df:
        # candidate generation over rare shingles only, derived from
        # the SAME persisted frame (df-cap as a semi-join)
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") <= max_shingle_df)
            .select("shingle")
        )
        cand_sh = sh.join(rare, "shingle", "left_semi")
        a = cand_sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = cand_sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        # exact verify: true |A∩B| over the full shingle sets of the
        # candidate pairs only (hot shingles count here)
        full_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        full_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        common = (
            cand.join(full_a, "doc_a")
            .join(full_b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash document fingerprints — Schleimer et al. 2003)
# ---------------------------------------------------------------------------

def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "md5",
    max_chars: int | None = None,
) -> DataFrame:
    """(doc_id, fp) — the distinct window-min k-gram hashes that make a
    document's winnowing fingerprint set (the MOSS local-fingerprint
    scheme: guaranteed to share a selected hash with any document that
    shares a run of ≥ k + window − 1 normalized characters).

    Fully relational: char k-grams of the lowercased ws-collapsed text,
    one hash per k-gram, rolling min over `window` consecutive
    positions, distinct. The plan is a single window function over
    (doc, position), partition-local after one shuffle.

    Scale knobs (owned by the operator, not the caller):

    - ``hash_mode="md5"``   — 32-char hex strings; bit-identical in
      DuckDB → the exact-oracle path.
    - ``hash_mode="xxh64"`` — 8-byte longs (Spark's xxhash64 per
      k-gram): 4× narrower rows through the explode+window shuffle,
      no hex encode — the 100 TB path. Selection positions differ
      from md5 mode (window-min is over hash order) but the MOSS
      shared-run guarantee holds identically in both modes (pinned
      by a property test).
    - ``max_chars`` — truncate the normalized text before k-gramming,
      bounding the per-doc row blowup (a 1 MB doc is 10⁶ exploded
      rows otherwise). Fingerprints equal those of the pre-truncated
      text by construction.
    """
    from pyspark.sql import Window as W

    from ..functions.text import collapse_whitespace

    if hash_mode not in ("md5", "xxh64"):
        raise ValueError(f"hash_mode={hash_mode!r} not in ('md5', 'xxh64')")
    hash_fn = "md5" if hash_mode == "md5" else "xxhash64"
    t = F.lower(collapse_whitespace(F.col(text_col)))
    if max_chars is not None:
        t = F.substring(t, 1, max_chars)
    norm = docs.select(
        F.col(id_col).alias("doc_id"), t.alias("t")
    ).filter(F.length("t") >= k)
    kg = norm.select(
        "doc_id",
        F.posexplode(
            F.expr(f"transform(sequence(1, length(t) - {k - 1}), "
                   f"i -> {hash_fn}(substring(t, i, {k})))")
        ).alias("i", "h"),
    )
    w = W.partitionBy("doc_id").orderBy("i").rowsBetween(0, window - 1)
    nk = W.partitionBy("doc_id")
    sel = kg.select(
        "doc_id", "i",
        F.min("h").over(w).alias("fp"),
        F.count(F.lit(1)).over(nk).alias("n_kgrams"),
    ).filter(F.col("i") <= F.col("n_kgrams") - window)  # full windows only
    return sel.select("doc_id", "fp").distinct()


def winnow_near_pairs(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    min_common: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "md5",
    max_chars: int | None = None,
    max_fp_df: int | None = 1000,
) -> DataFrame:
    """(doc_a, doc_b, common_fp, overlap) — document pairs sharing ≥
    ``min_common`` winnowing fingerprints; ``overlap`` = common /
    min(|A|, |B|) rounded to 6dp (the containment-style score MOSS
    reports). Completes the fingerprint family: winnowing guarantees
    any pair sharing a run of ≥ k + window − 1 normalized chars shares
    a selected fingerprint, so this is the local-overlap (plagiarism /
    near-copy) detector, complementing MinHash's global-Jaccard lens.

    Same shuffle pattern as the minhash band join: candidates come from
    an equi-join on the fingerprint hash (never a cross product), with
    the ``doc_a < doc_b`` triangle filter. Scale guard mirrors
    ngram_jaccard_pairs: fingerprints hotter than ``max_fp_df`` are
    excluded from CANDIDATE GENERATION (boilerplate runs shared by
    thousands of docs would otherwise explode the self-join
    quadratically), but ``common_fp``/``overlap`` are then computed
    EXACTLY over the candidates' full fingerprint sets, hot prints
    included. ``hash_mode="xxh64"`` is the narrow-shuffle 100 TB path;
    ``"md5"`` the exact-oracle path (same contract as
    winnowing_fingerprints)."""
    fps = winnowing_fingerprints(docs, k, window, id_col, text_col,
                                 hash_mode, max_chars)
    if max_fp_df:
        # the fingerprint frame feeds candidate generation, sizes and
        # the exact-verify joins — persist so the explode+window
        # lineage runs once. Lifetime is CALLER-OWNED (ADVICE r4): the
        # returned frame is lazy, so this function cannot unpersist;
        # MEMORY_ONLY on purpose — blocks are LRU-evicted under
        # pressure (worst case the lineage recomputes), so a long-lived
        # serving session accumulates at most its storage-memory pool,
        # never unbounded disk (same contract as ngram_jaccard_pairs)
        from pyspark import StorageLevel

        fps = fps.persist(StorageLevel.MEMORY_ONLY)
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    if max_fp_df:
        rare = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("fdf"))
            .filter(F.col("fdf") <= max_fp_df)
            .select("fp")
        )
        cand_fp = fps.join(rare, "fp", "left_semi")
        a = cand_fp.select(F.col("doc_id").alias("doc_a"), "fp")
        b = cand_fp.select(F.col("doc_id").alias("doc_b"), "fp")
        cand = (
            a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .dropDuplicates(["doc_a", "doc_b"])
        )
        full_a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
        full_b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
        common = (
            cand.join(full_a, "doc_a")
            .join(full_b, ["doc_b", "fp"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("common_fp"))
        )
    else:
        a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
        b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
        common = (
            a.join(b, "fp")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("common_fp"))
        )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a")
                    .withColumnRenamed("n_fp", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_fp", "nb"), "doc_b")
        .select(
            "doc_a", "doc_b", "common_fp",
            F.round(
                F.col("common_fp") / F.least(F.col("na"), F.col("nb")), 6
            ).alias("overlap"),
        )
        .filter(F.col("common_fp") >= min_common)
    )


# ---------------------------------------------------------------------------
# Exact span dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better"): remove repeated n-token spans
# CORPUS-WIDE, keeping the globally-first occurrence. Complements the
# document-level lenses — boilerplate paragraphs shared by otherwise-
# distinct documents never form doc-level near-pairs, but they are
# exactly what span dedup removes.
# ---------------------------------------------------------------------------

def _let(val: Column, body) -> Column:
    """Bind ``val`` to a lambda variable and evaluate ``body`` on it —
    a poor man's let-expression. Lambda variables are evaluated ONCE,
    so HOF bodies can reference the bound value per-element without
    the capture-re-evaluation trap (see shingles_expr), and no
    optimizer projection-collapse can inline the computation back into
    the loop."""
    return F.element_at(F.transform(F.array(val), body), 1)


def span_hashes_expr(col: Column, n: int, min_token_length: int = 2,
                     max_tokens: int | None = None) -> Column:
    """array<long>: xxhash64 of each n-token span (space-joined), one
    per token position; empty for docs with < n tokens. O(n·len) per
    doc (each span materializes its n tokens once — linear in doc
    length for fixed n)."""
    toks = tokens_expr(col, min_token_length)
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)

    def hashes(tk):
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, n))),
            ),
        ).otherwise(F.array().cast("array<long>"))

    return _let(toks, hashes)


def duplicated_spans(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = 2,
    max_tokens: int | None = None,
) -> DataFrame:
    """(doc_id, pos, span_hash, rank, n_occ) — every occurrence of a
    token n-gram appearing ≥ 2 times in the corpus. ``pos`` is the
    0-based token position of the span start; ``rank`` orders the
    occurrences of one span by global first-ness ((doc_id, pos)
    ascending) — rank 1 is the occurrence ``drop_duplicated_spans``
    keeps.

    DIAGNOSTIC surface: full per-occurrence ranks require a rank
    window over ``span_hash``, which has no partial aggregation — a
    boilerplate span repeated 10⁶ times is 10⁶ rows sorted by ONE
    task. Use this when you want to inspect every occurrence of the
    duplicated spans; the REMOVAL pipeline (:func:`drop_duplicated_
    spans`) never calls it — its first-occurrence/count reduction is
    aggregation-shaped (map-side combine absorbs the hot key, VERDICT
    r6 #2). Spans are matched by xxhash64 — a 64-bit collision marking
    a false duplicate is ~n_spans²/2⁶⁵ and affects single spans, not
    documents."""
    from pyspark.sql import Window as W

    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            span_hashes_expr(F.col(text_col), n, min_token_length,
                             max_tokens)
        ).alias("pos", "span_hash"),
    )
    w = W.partitionBy("span_hash").orderBy("doc_id", "pos")
    cw = W.partitionBy("span_hash")
    return (
        spans.select(
            "doc_id", "pos", "span_hash",
            F.row_number().over(w).alias("rank"),
            F.count(F.lit(1)).over(cw).alias("n_occ"),
        )
        .filter(F.col("n_occ") >= 2)
    )


def _nonfirst_span_occurrences(spans: DataFrame) -> DataFrame:
    """(doc_id, pos) of every span occurrence that is NOT the
    globally-first ((doc_id, pos) ascending) occurrence of its
    ``span_hash`` — i.e. exactly the occurrences the drop path removes.

    Aggregation-shaped, NOT a rank window (VERDICT r6 #2): the drop
    decision only needs each span's min occurrence and a count ≥ 2,
    both combiner-friendly — ``groupBy(span_hash).agg(min(struct(
    doc_id, pos)), count)`` runs map-side partial aggregation, so a
    boilerplate span repeated 10⁸ times (license headers, templates —
    guaranteed in a web corpus) contributes ONE partial row per map
    task instead of 10⁸ rows sorted by one window task. The join back
    is an equi-join on span_hash that AQE can broadcast (the
    duplicated-span set is usually a small fraction) or skew-split —
    both unavailable to a window sort. ``min(struct)`` compares
    field-wise, identical ordering to the old ``orderBy(doc_id,
    pos)`` window for both string and numeric ids."""
    firsts = (
        spans.groupBy("span_hash")
        .agg(
            F.min(F.struct("doc_id", "pos")).alias("first"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_occ") >= 2)
        .select("span_hash", "first")
    )
    return (
        spans.join(firsts, "span_hash")
        .filter(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .select("doc_id", "pos")
    )


def drop_duplicated_spans(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = 2,
    max_tokens: int | None = None,
) -> DataFrame:
    """(doc_id, text, n_tokens_removed) with every NON-FIRST occurrence
    of a corpus-duplicated n-token span removed: a token is dropped iff
    some rank ≥ 2 duplicate span covers it (overlapping removals union
    at token level; the rank-1 occurrence always survives in full
    unless a DIFFERENT span's duplicate overlaps it).

    The output text is rebuilt from the surviving TOKEN stream
    (space-joined, tokenizer-normalized — lowercased, punctuation
    stripped), the same token-stream semantics Lee et al. operate on;
    downstream consumers are training pipelines that tokenize anyway.
    Docs with no duplicated spans pass through with their token stream
    intact (n_tokens_removed = 0).

    Scale shape: one explode per pass, the first-occurrence reduction
    as a partial-aggregating groupBy + mark-join (hot-span-skew-safe,
    see :func:`_nonfirst_span_occurrences`; plan-gated by
    test_plan_shapes), then the interval-merged rewrite of
    :func:`_remove_span_occurrences`."""
    spans = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            span_hashes_expr(F.col(text_col), n, min_token_length,
                             max_tokens)
        ).alias("pos", "span_hash"),
    )
    rem = _nonfirst_span_occurrences(spans)
    return _remove_span_occurrences(docs, rem, n, id_col, text_col,
                                    min_token_length)


def _remove_span_occurrences(
    docs: DataFrame,
    removals: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    min_token_length: int,
) -> DataFrame:
    """Shared rewrite stage: drop the tokens covered by ``removals``
    ((doc_id, pos) span-start rows) and rebuild the token stream.
    Used by ``drop_duplicated_spans`` (batch) and
    ``span_filter_and_append`` (streaming)."""
    from pyspark.sql import Window as W

    # merge per-doc removal positions into coverage INTERVALS before
    # the join back: a fully-duplicated 1M-token doc has ~10⁶ removal
    # starts but ONE merged interval, so the per-token coverage check
    # below stays O(runs), not O(removals) — the same
    # quadratic-on-pathological-docs trap as raw starts would be
    rem = removals.select("doc_id", "pos")
    w = W.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    runs = (
        rem.select(
            "doc_id", "pos",
            F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1)
            .otherwise(0).alias("new_run"),
        )
        .withColumn("run_id", F.sum("new_run").over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ))
        .groupBy("doc_id", "run_id")
        .agg(F.min("pos").alias("s"), (F.max("pos") + n).alias("e"))
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("runs"))
    )
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_expr(F.col(text_col), min_token_length).alias("toks"),
    )
    joined = toked.join(runs, "doc_id", "left").select(
        "doc_id", "toks",
        F.coalesce(
            "runs", F.array().cast("array<struct<s:int,e:int>>")
        ).alias("runs"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.exists(
            F.col("runs"), lambda r: (i >= r.s) & (i < r.e)
        ),
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("text"),
        (F.size("toks") - F.size(kept)).alias("n_tokens_removed"),
    )


def _span_store_batches(span_dir: str, below: int | None = None) -> list[int]:
    """Sorted COMMITTED batch ordinals under ``spans/batch=N`` (dirs
    without ``_SUCCESS`` are crashed-append debris and are ignored);
    ``below`` keeps only ordinals < that stream batch id."""
    import os

    if not os.path.isdir(span_dir):
        return []
    out = []
    for name in os.listdir(span_dir):
        if not name.startswith("batch="):
            continue
        b = int(name.split("=", 1)[1])
        if below is not None and b >= below:
            continue
        if os.path.exists(os.path.join(span_dir, name, "_SUCCESS")):
            out.append(b)
    return sorted(out)


def span_filter_and_append(
    batch: DataFrame,
    span_dir: str,
    n: int,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = 2,
    max_tokens: int | None = None,
) -> DataFrame:
    """Streaming face of :func:`drop_duplicated_spans`: remove from an
    arriving micro-batch every occurrence of an n-token span already
    seen by the stream, rank non-first WITHIN the batch by the batch
    rule ((doc_id, pos) ascending), and append the batch's distinct
    span hashes to the persisted store (``span_dir/batch=<id>``).

    SEMANTICS DIVERGENCE vs the batch operator (deliberate, the
    streaming-dedup standard): across micro-batches the FIRST-ARRIVED
    occurrence survives, while ``drop_duplicated_spans`` keeps the
    first by (doc_id, pos) — the survivor differs exactly when a
    lower-id copy arrives later (token sets equal, owner differs), and
    on no other doc; both rules keep every duplicated span exactly
    once (pinned by test_streaming::
    test_streaming_span_divergence_is_exactly_out_of_order). An
    id-ordered RECONCILIATION pass cannot close this: the late
    lower-id copy was stripped on arrival, so its span tokens exist
    nowhere downstream to restore — demoting the arrival-first
    survivor would delete the corpus's last copy of the span. The
    divergence is therefore inherent to one-pass streaming, not a
    missing compaction.

    Replay-deterministic: the lookup reads ONLY committed store
    batches with ordinal < ``batch_id``, so a replay after a crash
    between the span append and the downstream index append sees the
    exact pre-append store and recomputes the identical rewrite (its
    own crashed half-append is either overwritten or ignored for want
    of ``_SUCCESS``)."""
    import os

    parent, name = os.path.split(os.path.abspath(span_dir))
    _recover_swap(parent, name)  # heal a crashed span_store_compact
    spark = batch.sparkSession
    spans_b = batch.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            span_hashes_expr(F.col(text_col), n, min_token_length,
                             max_tokens)
        ).alias("pos", "span_hash"),
    )
    # within-batch non-first occurrences via the same aggregation-
    # shaped reduction as the batch drop path (no rank window — a
    # boilerplate-heavy micro-batch has the same hot-span skew)
    removals = _nonfirst_span_occurrences(spans_b)
    prev = _span_store_batches(span_dir, below=int(batch_id))
    if prev:
        seen = (
            spark.read.option("basePath", span_dir)
            .parquet(*[f"{span_dir}/batch={b}" for b in prev])
            .select("span_hash")
        )
        in_seen = spans_b.join(seen, "span_hash", "left_semi") \
            .select("doc_id", "pos")
        removals = removals.unionByName(in_seen).distinct()
    cleaned = _remove_span_occurrences(batch, removals, n, id_col,
                                       text_col, min_token_length)
    spans_b.select("span_hash").distinct().write.mode("overwrite") \
        .parquet(f"{span_dir}/batch={int(batch_id)}")
    return cleaned


def span_store_compact(spark: SparkSession, span_dir: str) -> None:
    """Fold the span store's committed ``batch=N`` dirs into ONE
    distinct ``batch=0`` dir — the store otherwise grows one directory
    per stream micro-batch forever. Lookup semantics are unchanged
    (ordinal 0 precedes every future stream batch id). Swap discipline
    and the between-renames crash window share ``_recover_swap`` with
    the minhash/IVF compactors (healed on entry here and in
    ``span_filter_and_append``).

    Run only on a QUIESCED stream (no unfinalized in-flight batch): a
    crash-replay of batch K must see exactly the ordinals < K, and the
    fold collapses them all to 0 — same operational contract as
    ``minhash_index_compact``."""
    import os
    import shutil

    parent, name = os.path.split(os.path.abspath(span_dir))
    _recover_swap(parent, name)
    batches = _span_store_batches(span_dir)
    if len(batches) <= 1:
        return
    tmp = f"{span_dir}_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        spark.read.option("basePath", span_dir)
        .parquet(*[f"{span_dir}/batch={b}" for b in batches])
        .select("span_hash").distinct()
        .write.mode("overwrite").parquet(f"{tmp}/batch=0")
    )
    os.rename(span_dir, f"{span_dir}_old")
    os.rename(tmp, span_dir)
    shutil.rmtree(f"{span_dir}_old", ignore_errors=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig_0..sig_{P-1}) — one groupBy, P min-aggregates.

    Permutation i's hash of shingle s is md5(s || ':' || i): string-min
    is a valid uniform min-hash and is bit-identical in DuckDB.
    Docs with no shingles are excluded (no signature)."""
    sh = doc_shingles(docs, n, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f":{i}")))).alias(f"sig_{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate generation + signature-estimated Jaccard.

    Shingle → minhash → band → bucket-join: docs sharing any band's
    full signature slice become candidates; est_jaccard = fraction of
    agreeing permutations; pairs below threshold are dropped."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, id_col, text_col)

    band_cols = []
    for bnd in range(bands):
        cols = [f"sig_{bnd * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.md5(F.concat_ws("|", *cols)).alias(f"band_{bnd}")
        )
    # band joins shuffle ONLY (doc_id, band key) — the 2P signature
    # columns are re-attached once, after candidate dedup, instead of
    # being carried through every band join's shuffle
    banded = sig.select("doc_id", *band_cols)

    cand = None
    for bnd in range(bands):
        a = banded.select(
            F.col("doc_id").alias("doc_a"),
            F.col(f"band_{bnd}").alias("bkey"),
        )
        b = banded.select(
            F.col("doc_id").alias("doc_b"),
            F.col(f"band_{bnd}").alias("bkey"),
        )
        p = a.join(b, "bkey").filter(F.col("doc_a") < F.col("doc_b")).drop("bkey")
        cand = p if cand is None else cand.unionByName(p)

    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(num_perm)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(num_perm)],
    )
    cand = cand.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        cand.select(
            "doc_a", "doc_b",
            F.round(agree / F.lit(float(num_perm)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Connected components over a near-dup pair graph
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """(doc_id, component) for every node of the pair graph, where
    ``component`` is the MIN node id in the node's connected component —
    iterative min-label propagation to a fixpoint, plain DataFrame
    self-joins (no GraphX/graphframes dependency).

    Per iteration: each node takes min(own label, neighbors' labels) —
    one equi-join on the symmetrized edge list plus one min-aggregate,
    both shuffling on node id. Converges in O(graph diameter)
    iterations; near-dup graphs are dense clusters with tiny diameters,
    and ``max_iters`` bounds the pathological chain.

    Lineage is TRUNCATED per round with ``localCheckpoint`` (not just
    persisted): a cache keeps results but the LOGICAL plan still grows
    by the full upstream pair-producer tree every round, and with a
    large producer (simhash's 7-band 64-term key expressions) the
    accumulated plan OOMs the driver on plan-string rendering alone
    before any data moves. Checkpointed frames are pair-set-sized —
    orders of magnitude smaller than the corpus at 100 TB. (The
    standard iterative-algorithm trade: on executor loss a
    localCheckpoint partition is recomputation-unrecoverable and the
    job retries from the last action — acceptable for a fixpoint loop;
    use a reliable checkpoint dir if that matters.)"""
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iters):
        neigh = sym.join(
            labels, sym["dst"] == labels["doc_id"]
        ).select(F.col("src").alias("doc_id"), "component")
        new_labels = (
            neigh.unionByName(labels)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # ADVICE r4: silent unconverged labels would under-merge
        # clusters (pair-graph diameter > max_iters) and quietly
        # diverge from the transitive-closure semantics
        import warnings

        warnings.warn(
            f"connected_components: fixpoint NOT reached within "
            f"max_iters={max_iters} (graph diameter exceeds it) — "
            "labels are partial; raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def _banded_signatures(docs: DataFrame, num_perm: int, bands: int,
                       n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, sig_0..sig_{P-1}, band_0..band_{B-1}) — signatures plus
    the md5 band keys, one row per doc (the persisted layout of the
    incremental minhash index)."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, id_col, text_col)
    band_cols = []
    for bnd in range(bands):
        cols = [f"sig_{bnd * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *cols)).alias(f"band_{bnd}"))
    return sig.select("doc_id", *[F.col(f"sig_{i}") for i in range(num_perm)],
                      *band_cols)


def _signature_batches(index_dir: str) -> list[int]:
    """Sorted batch ordinals present under ``signatures/batch=N``."""
    import os

    sig_dir = os.path.join(index_dir, "signatures")
    if not os.path.isdir(sig_dir):
        return []
    out = []
    for name in os.listdir(sig_dir):
        if name.startswith("batch="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _recover_swap(index_dir: str, live_name: str) -> None:
    """Repair the compact-swap crash window (ADVICE r5 #2).

    ``minhash_index_compact`` / ``ivf_compact`` swap via
    ``rename(live, live_old); rename(live_compacting, live)`` — a crash
    BETWEEN those renames leaves NO dir at the live path. The
    compacting dir is always COMPLETE in that state (the parquet write
    finished before any rename started), so recovery rolls FORWARD to
    it; if only ``live_old`` survives (defensive — unreachable from the
    compact sequence itself) roll back. With the live dir present, any
    leftover sibling dirs are pre- or post-swap debris and are swept.
    Idempotent; called on entry to compact, append, and read paths.
    """
    import os
    import shutil

    live = os.path.join(index_dir, live_name)
    old = f"{live}_old"
    tmp = f"{live}_compacting"
    if not os.path.exists(live):
        if os.path.exists(tmp):
            os.rename(tmp, live)  # roll forward to the finished rewrite
        elif os.path.exists(old):
            os.rename(old, live)  # roll back
    for debris in (old, tmp):
        if os.path.exists(live) and os.path.exists(debris):
            shutil.rmtree(debris)


def _clean_partial_batches(index_dir: str) -> None:
    """Drop batch dirs without a ``_SUCCESS`` marker — debris from a
    crashed append. A half-committed batch must never feed the read
    side (same frozen-files discipline as the postings staging)."""
    import os
    import shutil

    sig_dir = os.path.join(index_dir, "signatures")
    for b in _signature_batches(index_dir):
        d = os.path.join(sig_dir, f"batch={b}")
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            shutil.rmtree(d)


def minhash_index_signatures(spark, index_dir: str) -> DataFrame:
    """The index's RESOLVED signature view: one row per doc_id, the
    newest batch winning — a re-appended doc_id (replay, or changed
    text) deterministically resolves to its latest signature. With a
    single batch dir (fresh build, or post-``minhash_index_compact``)
    the resolution window is skipped entirely."""
    from pyspark.sql import Window

    _recover_swap(index_dir, "signatures")
    batches = _signature_batches(index_dir)
    df = spark.read.parquet(f"{index_dir}/signatures")
    if len(batches) <= 1:
        return df.drop("batch")
    w = Window.partitionBy("doc_id").orderBy(F.col("batch").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch")
    )


def minhash_index_build(
    docs: DataFrame,
    index_dir: str,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the MinHash band index (signatures + band keys, one
    parquet row per doc) so near-dup detection becomes INCREMENTAL:
    each new batch is signed once and band-joined against this frame
    (``minhash_index_append_pairs``) instead of re-shingling and
    re-joining the whole corpus per refresh — at 100 TB the difference
    between O(batch) and O(corpus) work per append. Parameters are
    frozen in ``minhash.json`` (band keys are only comparable within
    one parameterization).

    Layout: each write lands in its own ``signatures/batch=N`` dir
    (Spark partition-discovers ``batch`` on read), so appends never
    touch existing files and replays resolve deterministically
    (newest batch wins — see ``minhash_index_signatures``)."""
    import json
    import os

    banded = _banded_signatures(docs, num_perm, bands, n, id_col, text_col)
    banded.write.mode("overwrite").parquet(f"{index_dir}/signatures/batch=0")
    os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/minhash.json", "w") as f:
        json.dump({"num_perm": num_perm, "bands": bands, "n": n}, f)


def minhash_index_append_pairs(
    new_docs: DataFrame,
    index_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sign the NEW batch, band-join it against the persisted index
    (old corpus ∪ the batch itself), APPEND the new signatures to the
    index, and return the estimated-Jaccard pairs involving at least
    one new doc — exactly the pairs a full recompute would add.
    (doc_a, doc_b, est_jaccard); doc_a < doc_b. ``new_docs`` must
    carry one row per doc_id (a batch is a set of documents).

    Shuffle shape: the band joins exchange only (doc_id, band key);
    signatures re-attach after candidate dedup — the same width
    discipline as minhash_lsh_pairs, but the joins' left side is the
    BATCH, not the corpus.

    Determinism discipline (ADVICE r4): the batch lineage is evaluated
    EXACTLY ONCE — the write into ``signatures/batch=N``. Both sides
    of the band join are then read back from the frozen files, so a
    nondeterministic ``new_docs`` (limit/sample/shuffle-derived)
    cannot make the persisted signatures and the pair computation see
    different row sets. The append still precedes pair computation, so
    a crash between the two leaves a complete index (pairs are
    recomputable; signatures are not cheap); a crash MID-append leaves
    a ``_SUCCESS``-less dir that the next append sweeps away."""
    import json

    with open(f"{index_dir}/minhash.json") as f:
        meta = json.load(f)
    num_perm, bands, n = meta["num_perm"], meta["bands"], meta["n"]
    _recover_swap(index_dir, "signatures")
    _clean_partial_batches(index_dir)
    batches = _signature_batches(index_dir)
    ordinal = (batches[-1] + 1) if batches else 0
    batch_path = f"{index_dir}/signatures/batch={ordinal}"
    _banded_signatures(new_docs, num_perm, bands, n, id_col, text_col) \
        .write.mode("overwrite").parquet(batch_path)
    spark = new_docs.sparkSession
    # FROZEN batch rows — the only evaluation of new_docs was the write
    new_banded = spark.read.parquet(batch_path)
    all_banded = minhash_index_signatures(spark, index_dir)
    cand = None
    for bnd in range(bands):
        a = new_banded.select(F.col("doc_id").alias("new_id"),
                              F.col(f"band_{bnd}").alias("bkey"))
        b = all_banded.select(F.col("doc_id").alias("other_id"),
                              F.col(f"band_{bnd}").alias("bkey"))
        p = (
            a.join(b, "bkey")
            .filter(F.col("new_id") != F.col("other_id"))
            .select(
                F.least("new_id", "other_id").alias("doc_a"),
                F.greatest("new_id", "other_id").alias("doc_b"),
            )
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    sig_a = all_banded.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(num_perm)],
    )
    sig_b = all_banded.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(num_perm)],
    )
    cand = cand.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_perm)
    )
    return (
        cand.select(
            "doc_a", "doc_b",
            F.round(agree / F.lit(float(num_perm)), 6).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_index_compact(spark, index_dir: str) -> None:
    """Rewrite ``signatures/`` as ONE batch dir holding the resolved
    view (newest signature per doc_id), dropping replay duplicates and
    superseded rows — the maintenance counterpart of the postings
    index's ``compact_index``. After compaction the read side skips
    the per-doc resolution window entirely (single-batch fast path in
    ``minhash_index_signatures``), so every future append pays only
    its own batch's work.

    Swap discipline: write to a sibling dir, rename the old layout
    aside, rename the new one in, then delete the old. A crash between
    the two renames leaves NO dir at the live path — ``_recover_swap``
    (run on entry to compact, append, and the read path) rolls forward
    to the completed ``signatures_compacting`` (or back to
    ``signatures_old``), so recovery is automatic, not manual."""
    import os
    import shutil

    _recover_swap(index_dir, "signatures")
    _clean_partial_batches(index_dir)
    resolved = minhash_index_signatures(spark, index_dir)
    tmp = f"{index_dir}/signatures_compacting"
    resolved.write.mode("overwrite").parquet(f"{tmp}/batch=0")
    old = f"{index_dir}/signatures_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(f"{index_dir}/signatures", old)
    os.rename(tmp, f"{index_dir}/signatures")
    shutil.rmtree(old)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def term_hash32(col: Column) -> Column:
    """32-bit term hash from the first 8 md5 hex chars — identical in
    DuckDB via ('0x' || substr(md5(t),1,8))::UBIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash(
    docs: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = 2,
) -> DataFrame:
    """(doc_id, simhash) — tf-weighted sign-sum over term-hash bits.

    Relational formulation: explode (doc, term, tf), then `bits`
    conditional sums in ONE hash aggregate (single shuffle), then the
    bit recomposition as a plain expression.

    ``bits`` ≤ 62: the fingerprint is recomposed into a signed long
    (2^63 would overflow the literal). For a 64-bit fingerprint, run
    two 32-bit halves over independent term-hash slices.
    """
    if not 1 <= bits <= 62:
        raise ValueError(
            f"bits={bits} out of range 1..62 — the signed-long "
            "recomposition cannot hold 2^63; use two 32-bit halves"
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col), min_token_length)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn("h", term_hash32(F.col("term")))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                   F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s_{j}")
        for j in range(bits)
    ]
    sums = h.groupBy("doc_id").agg(*aggs)
    sim = sum(
        F.when(F.col(f"s_{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        for j in range(bits)
    )
    return sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash64(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_token_length: int = 2,
) -> DataFrame:
    """(doc_id, sim_lo, sim_hi) — a 64-bit SimHash as two independent
    32-bit halves (the composition the ``simhash`` docstring defers
    to: a single signed long cannot hold bit 63's 2^63 weight).

    Half ``lo`` uses the term hash from md5 hex chars [1..8] (the same
    32-bit slice ``simhash`` uses — ``sim_lo`` equals ``simhash(bits=
    32)`` exactly), half ``hi`` the independent slice [9..16]. One
    explode + ONE hash aggregate computes all 64 conditional sums
    (same single-shuffle shape as the 32-bit operator)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col), min_token_length)).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = tf.withColumn("h_lo", term_hash32(F.col("term"))).withColumn(
        "h_hi",
        F.conv(F.substring(F.md5(F.col("term")), 9, 8), 16, 10).cast("long"),
    )
    aggs = []
    for half in ("lo", "hi"):
        for j in range(32):
            aggs.append(
                F.sum(
                    F.when(
                        F.shiftright(F.col(f"h_{half}"), j)
                        .bitwiseAND(F.lit(1)) == 1,
                        F.col("tf"),
                    ).otherwise(-F.col("tf"))
                ).alias(f"s_{half}_{j}")
            )
    sums = h.groupBy("doc_id").agg(*aggs)
    out_cols = ["doc_id"]
    for half in ("lo", "hi"):
        sim = sum(
            F.when(F.col(f"s_{half}_{j}") > 0, F.lit(2 ** j)).otherwise(
                F.lit(0)
            )
            for j in range(32)
        )
        out_cols.append(sim.cast("long").alias(f"sim_{half}"))
    return sums.select(*out_cols)


def _drop_hot_buckets(keyed: DataFrame, max_bucket_df: "int | None",
                      key_col: str = "bkey") -> DataFrame:
    """Scale guard shared by the simhash band joins: drop bucket keys
    with df > ``max_bucket_df`` from candidate generation (semi-join
    against the cool keys — the same df-cap shape as
    ``ngram_jaccard_pairs``/``winnow_near_pairs``). A simhash segment
    key is only ~8-10 bits wide, so boilerplate corpora concentrate
    huge doc sets on a few keys and the unguarded triangle join goes
    quadratic per bucket; the exact hamming verify downstream keeps
    every EMITTED pair true, so the cap trades only recall — a pair
    whose every shared segment is hotter than the cap is missed."""
    if not max_bucket_df:
        return keyed
    cool = (
        keyed.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("bdf"))
        .filter(F.col("bdf") <= max_bucket_df)
        .select(key_col)
    )
    return keyed.join(cool, key_col, "left_semi")


def simhash64_near_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_df: "int | None" = None,
) -> DataFrame:
    """64-bit near-dup pairs: band the (lo, hi) fingerprint into
    ``max_hamming + 1`` segments across the two halves (pigeonhole —
    any pair within the hamming budget shares at least one full
    segment), bucket-join, verify the exact 64-bit hamming distance
    (bit_count of both halves' XORs).

    ``max_bucket_df`` caps the per-band bucket df — see
    ``_drop_hot_buckets``. Default ``None`` = exhaustive pigeonhole
    recall (the operator's advertised guarantee; ADVICE r5 #3 — a
    silent default cap dropped pairs whose every shared segment landed
    in a hot bucket). The scale guard is opted into WHERE scale is the
    contract: ``prepare_corpus`` / ``near_dup_drop_ids`` pass
    ``simhash_max_bucket_df=1000`` by default."""
    sh = simhash64(docs, id_col, text_col)
    n_bands = max_hamming + 1
    # segment the 64 bits round-robin across bands: band b owns bits
    # {i : i mod n_bands == b}, gathered from whichever half holds them
    cand = None
    for bnd in range(n_bands):
        def seg(col, base, b=bnd):
            bits = [i for i in range(32) if (base + i) % n_bands == b]
            expr = F.lit(0)
            for pos, i in enumerate(bits):
                expr = expr + (
                    F.shiftright(F.col(col), i).bitwiseAND(F.lit(1))
                    * F.lit(2 ** pos)
                )
            return expr
        key = (seg("sim_lo", 0) * F.lit(1 << 32) + seg("sim_hi", 32))
        keyed = _drop_hot_buckets(
            sh.select("doc_id", "sim_lo", "sim_hi", key.alias("bkey")),
            max_bucket_df,
        )
        a = keyed.select(F.col("doc_id").alias("doc_a"),
                         F.col("sim_lo").alias("la"),
                         F.col("sim_hi").alias("ha"), "bkey")
        b_ = keyed.select(F.col("doc_id").alias("doc_b"),
                          F.col("sim_lo").alias("lb"),
                          F.col("sim_hi").alias("hb"), "bkey")
        p = a.join(b_, "bkey").filter(F.col("doc_a") < F.col("doc_b")) \
            .drop("bkey")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    dist = (
        F.bit_count(F.col("la").bitwiseXOR(F.col("lb")))
        + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    )
    return cand.select(
        "doc_a", "doc_b", dist.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_near_pairs(
    docs: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    band_bits: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_df: "int | None" = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint (pigeonhole —
    hamming ≤ k pairs share ≥1 of k+1 bands), bucket-join, verify exact
    hamming distance with bit_count. ``max_bucket_df`` caps the
    per-band bucket df (see ``_drop_hot_buckets``); default ``None``
    keeps the exhaustive pigeonhole guarantee (ADVICE r5 #3) — the
    pipeline layer opts into the cap."""
    sh = simhash(docs, bits, id_col, text_col)
    n_bands = max_hamming + 1
    width = bits // n_bands
    cand = None
    for bnd in range(n_bands):
        key = F.shiftright(F.col("simhash"), bnd * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        keyed = _drop_hot_buckets(
            sh.select("doc_id", "simhash", key.alias("bkey")), max_bucket_df
        )
        a = keyed.select(F.col("doc_id").alias("doc_a"),
                         F.col("simhash").alias("ha"), "bkey")
        b = keyed.select(F.col("doc_id").alias("doc_b"),
                         F.col("simhash").alias("hb"), "bkey")
        p = a.join(b, "bkey").filter(F.col("doc_a") < F.col("doc_b")).drop("bkey")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["doc_a", "doc_b"])
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select(
        "doc_a", "doc_b", dist.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
