"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in JVM functions (codegen'd, no
Python): language-ID (character-class ratios), quality scoring
(length / punctuation / stopword / word-shape signals), token counts,
and document fingerprints (content hash + positional sample hash).

These are the operators a 100 TB corpus-curation pipeline runs over
every document, so they must be pure column expressions — one scan, no
shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_expr

_JP_CLASS = "[぀-ゟ゠-ヿ一-鿿]"
_LATIN_CLASS = "[a-zA-Z]"
_PUNCT_CLASS = r"[\p{Punct}、。！？．，]"

EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "for on with as at by from"
).split()


def _count_class(col: Column, cls: str) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, cls, ""))


def language_id(col: Column) -> Column:
    """'ja' / 'en' / 'und' by dominant character class (n-gram-free
    heuristic: CJK+kana chars vs latin chars)."""
    jp = _count_class(col, _JP_CLASS)
    latin = _count_class(col, _LATIN_CLASS)
    return (
        F.when(jp + latin == 0, F.lit("und"))
        .when(jp >= latin, F.lit("ja"))
        .otherwise(F.lit("en"))
    )


def token_count(col: Column, min_token_length: int = 2) -> Column:
    """Number of index tokens (same token spec as the BM25 engine)."""
    return F.size(tokens_expr(col, min_token_length))


def word_count(col: Column) -> Column:
    """Whitespace word count (BPE-ish upper bound is chars/4 for EN).

    Split class comes from functions.text._WS_CLASS_JAVA so it stays in
    lockstep with the DuckDB oracle's WS_RE2 (incl. NBSP \\u00a0 and
    ideographic space \\u3000 — a hand-written class omitting NBSP made
    n_words diverge on NBSP documents)."""
    from ..functions.text import _WS_CLASS_JAVA

    return F.size(
        F.filter(F.split(col, _WS_CLASS_JAVA + "+"), lambda w: F.length(w) > 0)
    )


def punct_ratio(col: Column) -> Column:
    return F.when(F.length(col) == 0, 0.0).otherwise(
        _count_class(col, _PUNCT_CLASS) / F.length(col)
    )


def stopword_ratio(col: Column, min_token_length: int = 2) -> Column:
    toks = tokens_expr(col, min_token_length)
    stops = F.filter(toks, lambda t: t.isin(EN_STOPWORDS))
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        F.size(stops) / F.size(toks)
    )


def mean_word_length(col: Column) -> Column:
    toks = tokens_expr(col, 1)
    return F.when(F.size(toks) == 0, 0.0).otherwise(
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / F.size(toks)
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough text, sane punctuation
    density, sane mean word length. Deterministic, expression-only."""
    n = F.length(col)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct = punct_ratio(col)
    punct_score = F.when(punct > 0.3, 0.0).otherwise(1.0 - punct / 0.3)
    mwl = mean_word_length(col)
    mwl_score = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.3)
    return F.round(
        0.4 * len_score + 0.3 * punct_score + 0.3 * mwl_score, 6
    )


# BPE-ish subword-count estimator: letter runs count once, digits and
# every other non-space symbol (incl. each CJK char) count singly —
# the classic cheap proxy for byte-pair-encoded token counts. The
# pattern is shared verbatim with the DuckDB oracle; whitespace is
# spelled as explicit chars because Java's \s and RE2's \s disagree
# on \x0B.
BPEISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r\\f]"


def bpeish_token_count(col: Column) -> Column:
    return F.size(
        F.regexp_extract_all(col, F.lit(BPEISH_PATTERN), F.lit(0))
    )


def fingerprint(col: Column) -> Column:
    """Whole-document content fingerprint: 64-bit xxhash of the
    whitespace-normalized text (exact-dup key)."""
    from ..functions.text import collapse_whitespace

    return F.xxhash64(collapse_whitespace(col))


def fingerprint_md5(col: Column) -> Column:
    """Oracle-friendly variant: md5 hex of normalized text (identical
    string in Spark and DuckDB)."""
    from ..functions.text import collapse_whitespace

    return F.md5(collapse_whitespace(col))


def text_profile(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """One profiling row per doc — the corpus-curation workhorse."""
    c = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        word_count(c).alias("n_words"),
        language_id(c).alias("lang"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        fingerprint_md5(c).alias("fingerprint"),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document repetition signals — the Gopher/RefinedWeb-style
    repetition filters a training-data pipeline runs alongside the
    quality score (machine-generated boilerplate and templated spam
    repeat lines and n-grams far above natural prose):

    - ``n_lines``            non-empty trimmed lines
    - ``dup_line_frac``      fraction of lines that are repeats of an
                             already-seen line
    - ``dup_line_char_frac`` fraction of line characters inside those
                             repeat occurrences (first occurrence is
                             not a dup; Gopher's "chars in duplicated
                             lines")
    - ``top_bigram_frac``    fraction of word-bigram slots occupied by
                             the single most frequent bigram (word =
                             whitespace token, same split class as
                             ``word_count``)

    Pure column expressions (array ops, no shuffle, no UDF) with an
    exact DuckDB twin pinned by tests/test_textstats.py. The top-bigram
    mode count is the O(n log n) sort + linear run scan in
    :func:`top_bigram_frac` — per-row work, bounded by doc length,
    embarrassingly parallel (do NOT "simplify" it back to the
    distinct×filter count: that one is O(distinct·n), quadratic on a
    million-token doc).
    """
    c = F.col(text_col)
    lines = _trimmed_lines(c)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("int").alias("n_lines"),
        F.round(dup_line_frac(c), 6).alias("dup_line_frac"),
        F.round(dup_line_char_frac(c), 6).alias("dup_line_char_frac"),
        F.round(top_bigram_frac(c), 6).alias("top_bigram_frac"),
    )


def _trimmed_lines(col: Column) -> Column:
    return F.filter(
        F.transform(F.split(col, "\\r?\\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def dup_line_frac(col: Column) -> Column:
    """Fraction of non-empty trimmed lines that repeat an
    already-seen line."""
    lines = _trimmed_lines(col)
    n = F.size(lines)
    return F.when(n == 0, 0.0).otherwise(
        (n - F.size(F.array_distinct(lines))) / n
    )


def dup_line_char_frac(col: Column) -> Column:
    """Fraction of line characters inside repeat line occurrences
    (first occurrence is not a dup)."""
    lines = _trimmed_lines(col)
    total = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    dist = F.aggregate(F.array_distinct(lines), F.lit(0),
                       lambda acc, l: acc + F.length(l))
    return F.when(total == 0, 0.0).otherwise((total - dist) / total)


def top_bigram_frac(col: Column) -> Column:
    """Fraction of word-bigram slots held by the single most frequent
    bigram (word = whitespace token, same split class as
    ``word_count``)."""
    from ..functions.text import _WS_CLASS_JAVA

    words = F.filter(F.split(col, _WS_CLASS_JAVA + "+"),
                     lambda w: F.length(w) > 0)
    n_words = F.size(words)
    # adjacent pairs via zip_with over two slices — NOT
    # transform(sequence(...), i -> element_at(words, i)): an
    # element_at inside a lambda re-evaluates the whole filter(split())
    # expression per element (no CSE inside HOF lambdas), turning a
    # 100k-word doc into an O(n²) row. zip_with touches each array
    # expression once per row.
    bigrams = F.when(
        n_words >= 2,
        F.zip_with(
            F.slice(words, 1, n_words - 1),
            F.slice(words, 2, n_words - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    # mode count via sort + linear run scan — O(n log n) per doc. The
    # obvious distinct×filter count is O(distinct·n), quadratic on a
    # million-token document: exactly the doc shape a 100 TB corpus is
    # guaranteed to contain.
    sorted_bg = F.array_sort(bigrams)
    top_bg = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best,
                F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    ).best
    return F.when(n_bg <= 0, 0.0).otherwise(top_bg / n_bg)


# PII patterns — written in the Java-regex ∩ RE2 common subset so the
# SAME strings run in Spark (Java) and DuckDB (RE2): ASCII classes,
# bounded repeats, \b word boundaries; no lookaround, no \p classes.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    # US-style 555-123-4567 / 555.123.4567 and +<7-15 digit> intl
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b|\+\d{7,15}",
    # US SSN 123-45-6789 — conservative shape-only match (VERDICT r6
    # #6; no area-number exclusions: false positives preferred over
    # leaks, and the exclusion alternation buys ~nothing on web text)
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}

# credit-card candidates: 4-4-4-4 groups with uniform -/space
# separators, or 13-19 bare digits (the ISO/IEC 7812 PAN length
# range). Candidates are then CHECKED with the Luhn checksum
# engine-side — regex alone can't distinguish a card number from an
# order id, the checksum can (and it is an aggregate expression both
# engines evaluate identically).
CC_CANDIDATE_PATTERN = (
    r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b|\b\d{13,19}\b"
)

# every kind redact_pii / pii_stats / pii_match_count know about; the
# checked (non-pure-regex) kinds come FIRST: card matches are
# extracted from the ORIGINAL column and folded before the
# regexp_replace chain, so the checksum never sees a masked token
PII_KINDS: "tuple[str, ...]" = ("credit_card", *PII_PATTERNS)


def luhn_valid(cand: Column) -> Column:
    """True iff the digits of ``cand`` (separators stripped) pass the
    Luhn checksum and form a plausible PAN length (13-19). Pure column
    arithmetic — the fold runs over ≤ 19 digits per candidate, and the
    DuckDB twin (plans/oracle_sql.luhn_sql) computes the identical
    sum, so credit-card detection stays exact-oracle-checkable."""
    ds = F.reverse(F.regexp_replace(cand, r"[^0-9]", ""))
    # F.sequence(1, 0) DESCENDS — guard the empty-digits case even
    # though the candidate regex guarantees ≥ 13 digits
    idx = F.when(F.length(ds) > 0,
                 F.sequence(F.lit(1), F.length(ds))) \
        .otherwise(F.array().cast("array<int>"))

    def step(acc: Column, i: Column) -> Column:
        d = F.substring(ds, i, F.lit(1)).cast("int")
        dbl = d * 2
        return acc + F.when(
            i % 2 == 0, F.when(dbl > 9, dbl - 9).otherwise(dbl)
        ).otherwise(d)

    return (F.aggregate(idx, F.lit(0), step) % 10 == 0) & \
        (F.length(ds) >= 13)


def credit_card_matches(col: Column) -> Column:
    """array<string> of Luhn-valid credit-card spans in ``col`` (each
    occurrence listed, like regexp_extract_all)."""
    return F.filter(
        F.regexp_extract_all(col, F.lit(CC_CANDIDATE_PATTERN), 0),
        luhn_valid,
    )


def redact_pii(col: Column, kinds: "tuple[str, ...]" = PII_KINDS,
               cc_matches: Column | None = None) -> Column:
    """Mask PII spans with <EMAIL>/<IPV4>/<PHONE>/<SSN>/<CREDIT_CARD>
    tokens — the standard regex scrub a training-data pipeline runs
    before publication (Dolma/RedPajama-style; conservative ASCII
    patterns, false positives preferred over leaks). The regex kinds
    are a pure regexp_replace chain; ``credit_card`` folds its
    Luhn-valid match list over the text with literal replace. All of
    it is scan-fused column expressions, zero shuffle, with exact
    DuckDB twins (same pattern strings, same checksum).

    ``cc_matches``: optional pre-computed ``credit_card_matches(col)``
    column — pass it when the caller ALSO needs the match list (gate +
    scrub on one path), so the candidate regexp_extract_all + Luhn
    fold runs once per row instead of per consumer (VERDICT r7 #4;
    the Luhn filter is a higher-order function, outside codegen
    subexpression elimination)."""
    out = col
    for k in kinds:
        if k == "credit_card":
            cc = cc_matches if cc_matches is not None \
                else credit_card_matches(col)
            out = F.aggregate(
                cc, out,
                lambda acc, c: F.replace(acc, c, F.lit("<CREDIT_CARD>")),
            )
        else:
            out = F.regexp_replace(out, PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def pii_match_count(col: Column,
                    kinds: "tuple[str, ...]" = PII_KINDS,
                    cc_matches: Column | None = None) -> Column:
    """Total PII matches across ``kinds`` — the density signal the
    pipeline's ``max_pii_count`` gate filters on (drop PII-dense docs
    instead of publishing a mask-riddled page). ``cc_matches`` as in
    :func:`redact_pii`."""
    total = F.lit(0)
    for k in kinds:
        if k == "credit_card":
            cc = cc_matches if cc_matches is not None \
                else credit_card_matches(col)
            total = total + F.size(cc)
        else:
            total = total + F.regexp_count(col, F.lit(PII_PATTERNS[k]))
    return total


def pii_stats(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-doc PII match counts (one column per kind, credit cards
    Luhn-checked) + fully redacted text.

    The Luhn-checked card match list is hoisted into ONE projected
    column consumed by both ``n_credit_card`` and the redaction fold
    (r8, VERDICT r7 #4) — the candidate scan + checksum is a
    higher-order function chain that codegen subexpression elimination
    does not dedupe, so inlining it twice doubled the regex work per
    row. Output schema and values are unchanged."""
    c = F.col(text_col)
    pre = docs.select(
        F.col(id_col).alias("doc_id"),
        c.alias("__pii_text"),
        credit_card_matches(c).alias("__cc"),
    )
    t = F.col("__pii_text")
    return pre.select(
        "doc_id",
        *[
            F.regexp_count(t, F.lit(p)).alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
        F.size("__cc").alias("n_credit_card"),
        redact_pii(t, cc_matches=F.col("__cc")).alias("redacted_text"),
    )


def unigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — model-free perplexity proxy:
    a unigram language model trained on the CORPUS ITSELF scores each
    document by its mean token log-likelihood,
    avg_logprob = Σ_t tf(d,t)·ln(cf_t / total_terms) / dl(d).

    The standard cheap fluency/outlier signal in training-data
    curation (gibberish, wrong-language, and boilerplate-repetition
    docs sit far from the corpus mode) when no external LM is
    available — and unlike a model-backed perplexity it is fully
    relational: one tokenize+explode, one (term) aggregate for
    collection frequencies, one broadcast-joined per-doc aggregate.
    Docs with zero tokens are excluded (no likelihood is defined).

    100 TB shape: two hash aggregates and one join keyed on term —
    the same shuffle profile as term_frequencies + vocabulary; the
    corpus-totals row is a broadcast singleton."""
    from .termindex import term_frequencies

    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total_terms"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("total_terms")))
                / F.sum("tf")
            ).alias("avg_logprob"),
        )
    )
    if round_digits is not None:
        scored = scored.select(
            "doc_id", "n_tokens",
            F.round("avg_logprob", round_digits).alias("avg_logprob"),
        )
    return scored


def top_terms_per_doc(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = None,
) -> DataFrame:
    """(doc_id, term, rank, tfidf) — the top-k highest tf·idf terms of
    every document: keyword extraction / doc labeling for corpus
    triage, using the ENGINE's ln-IDF (idf_expr — no +1, negative for
    df > N/2, so corpus-dominant words rank themselves out) with the
    engine's N contract (every doc counts, token-empty included).
    Ties break (tfidf desc, term asc) — deterministic output.

    100 TB shape: the tf explode/aggregate, one term-keyed join
    against the (much smaller) vocabulary, and one window shuffle on
    doc_id over tf rows; the N row is a broadcast singleton."""
    from pyspark.sql import Window

    from .termindex import idf_expr, term_frequencies, vocabulary

    tf = term_frequencies(docs, id_col=id_col, text_col=text_col)
    vocab = vocabulary(tf)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("total_documents")
    )
    scored = (
        tf.join(vocab.select("term", "document_frequency"), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term",
            (
                F.col("tf")
                * idf_expr(F.col("document_frequency"),
                           F.col("total_documents"))
            ).alias("tfidf"),
        )
    )
    if round_digits is not None:
        scored = scored.select(
            "doc_id", "term",
            F.round("tfidf", round_digits).alias("tfidf"),
        )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "tfidf")
    )


def discover_stopwords(
    docs: DataFrame,
    max_df_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = None,
) -> DataFrame:
    """(term, document_frequency, df_ratio) for every term appearing in
    more than ``max_df_ratio`` of the documents — corpus-derived
    stopword discovery. The reference ships a static JP/EN list
    (tokenizer stop-word filter, off by default); at 100 TB the
    domain's own boilerplate vocabulary ("subject", "wrote", markup
    remnants) is corpus-specific, so the list should be DERIVED and fed
    back into ``term_frequencies(stop_words=...)`` / the index build.
    N follows the engine contract (every doc counts, token-empty
    included). One tokenize+explode and one term aggregate; the N row
    is a broadcast singleton."""
    from .termindex import term_frequencies, vocabulary

    vocab = vocabulary(term_frequencies(docs, id_col=id_col,
                                        text_col=text_col))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("total_documents")
    )
    out = (
        vocab.crossJoin(F.broadcast(n_docs))
        .select(
            "term", "document_frequency",
            (F.col("document_frequency") / F.col("total_documents"))
            .alias("df_ratio"),
        )
        .filter(F.col("df_ratio") > max_df_ratio)
    )
    if round_digits is not None:
        out = out.select(
            "term", "document_frequency",
            F.round("df_ratio", round_digits).alias("df_ratio"),
        )
    return out
