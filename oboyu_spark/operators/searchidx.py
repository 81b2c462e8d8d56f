"""Query engine over the compressed doc-sharded index (scatter-gather).

Plan shape per batch of queries:

1. driver: tokenize queries (same tokenizer as the build — reference
   tokenizer.py:374-376), slice the vocabulary for the union of query
   terms (parquet scan with an IN-pushed filter → a few rows), compute
   idf per term driver-side (tiny), broadcast.
2. scatter: read postings parquet filtered to query terms (row-group
   pruning via term min/max — rows are sorted by term within each
   shard), group by shard, score inside a vectorized Arrow UDF:
   dense-accumulator term-at-a-time (TAAT) scoring — shard-local doc
   ids are contiguous (range sharding), so the accumulator is a flat
   float64 array and each posting costs one vectorized add. Each shard
   emits its local top-k with the global tie-break.
3. gather: global candidates per query (rank window over ≤ shards×k
   rows, boundary score-ties kept), hydrate original doc keys via the
   docmap, final top-k cut tie-broken on the ORIGINAL doc_id (doc_int
   order only matches key order within a shard, not across appends).

Exactness: TAAT scores every matched posting — results match the
relational plan bit-for-bit up to float summation order (tests compare
at 1e-9 and rank-identical). The block-max WAND scorer (wand.py) is the
pruned alternative; both must agree exactly on fixtures.
"""

from __future__ import annotations

import math
import threading
import time
from typing import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import py_tokenize
from .codec import decode_doc_ids, decode_varbyte
from .postings import load_meta

RESULT_SCHEMA = "query_id int, doc_int long, score double"

# gather strategy cutover: below this many candidate rows
# (queries × shards × k) the shard winners are rank-cut on the driver
# (skips a window shuffle — latency path); above it the rank runs in
# Spark (cluster scale, 10^4+ shards)
DRIVER_CUT_MAX_ROWS = 200_000

# part-level pruning bounds: a term found in more bparts than this
# prunes nothing (and its full part list would bloat the df cache at
# hot-term vocabularies) — recorded as "all parts"; and a query whose
# union of part lists exceeds the second bound skips the bpart filter
# (a 10^4-literal In over a partition column costs more than it saves)
PART_PRUNE_MAX_PER_TERM = 4096
PART_PRUNE_MAX_UNION = 16384

# scorer="auto" cutovers, from the r7 geometry study
# (exp_bmw_kernel.py / BENCH.md): block-max pruning beats the
# vectorized TAAT accumulate only when per-shard posting lists are
# long (big shards) AND some query term is selective enough to lift
# the top-k threshold above the hot cells — measured 4.9× kernel /
# 2.46× batch at 130k-doc shards with a df≈0.02% term, and a LOSS
# (0.6×) at 10k-doc shards or on all-hot queries.
AUTO_BMW_MIN_SHARD = 64_000
AUTO_BMW_MAX_DF_FRAC = 0.01

class _ThreadLocalScanInfo(threading.local):
    """Dict-shaped per-THREAD record of the last search's pruning
    decision — which bparts the postings scan was limited to (None =
    no pruning applied). Overwritten per _search call; read by
    test_plan_shapes/test_index. Thread-local (ADVICE r6) so
    concurrent searches on one SparkSession don't interleave each
    other's records; note exp_part_prune.py's PART_PRUNE_MAX_UNION
    override remains a module-global experiment knob, not a serving
    seam."""

    def __init__(self) -> None:
        self._d: dict = {}

    def clear(self) -> None:
        self._d.clear()

    def get(self, key, default=None):
        return self._d.get(key, default)

    def __getitem__(self, key):
        return self._d[key]

    def __setitem__(self, key, value) -> None:
        self._d[key] = value

    def __contains__(self, key) -> bool:
        return key in self._d

    def __repr__(self) -> str:
        return repr(self._d)


_LAST_SCAN_INFO = _ThreadLocalScanInfo()


def _docmap_for_ids(
    dm: DataFrame | None,
    meta: dict,
    ids: Sequence[int],
    spark: SparkSession | None = None,
    index_dir: str | None = None,
) -> DataFrame:
    """Docmap rows for specific winner doc_ints, PARTITION-pruned:
    doc_int // (shard_size · shards_per_part) == bpart by construction
    (staging assigns dense ids in part order, appends continue the
    sequence, compaction preserves survivor ids), so the winners' few
    containing parts become a bpart directory filter — at 10⁴ parts
    this skips 10⁴−ε footer reads per hydration; the In(doc_int)
    filter then row-group-prunes inside them. Pass ``dm=None`` (with
    ``spark``/``index_dir``) on the one-shot path: the relation is
    then built from ONLY the containing bpart directories, skipping
    root partition discovery too (a root read lists every directory
    before PartitionFilters apply). Pre-r7 indexes (no
    shards_per_part in meta) keep the plain id filter."""
    spp = meta.get("shards_per_part")
    parts = (
        sorted({int(i) // (int(meta["shard_size"]) * int(spp))
                for i in ids})
        if spp else None
    )
    if dm is None:
        if parts is not None:
            return spark.read.option(
                "basePath", f"{index_dir}/docmap"
            ).parquet(
                *[f"{index_dir}/docmap/bpart={p}" for p in parts]
            ).filter(F.col("doc_int").isin(list(ids)))
        dm = spark.read.parquet(f"{index_dir}/docmap")
    dm = dm.filter(F.col("doc_int").isin(list(ids)))
    if parts is not None:
        dm = dm.filter(F.col("bpart").isin(parts))
    return dm


def _query_maps(queries: Sequence[str], min_token_length: int):
    """qid -> [(term, qtf)], and the union term set."""
    qmap: dict[int, list[tuple[str, int]]] = {}
    all_terms: set[str] = set()
    for qid, q in enumerate(queries):
        terms = py_tokenize(q, min_token_length=min_token_length)
        counts: dict[str, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        qmap[qid] = sorted(counts.items())
        all_terms.update(counts)
    return qmap, sorted(all_terms)


def _decode_rows(pdf: pd.DataFrame, base: int, tomb: np.ndarray | None = None):
    """(th1, th2) -> list of (local_ids int64, wtf float64) chunks, each
    sorted by doc id (chunks are salt ranges, mutually disjoint).
    ``tomb``: sorted global doc ints to mask out (deleted docs)."""
    decoded: dict[tuple[int, int], list[tuple[np.ndarray, np.ndarray]]] = {}
    order = pdf.sort_values(["th1", "th2", "salt"])
    for r in order.itertuples():
        gids = decode_doc_ids(r.gaps).astype(np.int64)
        wtf = np.asarray(r.wtf, dtype=np.float64)
        if tomb is not None and tomb.size:
            keep = ~np.isin(gids, tomb, assume_unique=False)
            gids = gids[keep]
            wtf = wtf[keep]
        decoded.setdefault((int(r.th1), int(r.th2)), []).append((gids - base, wtf))
    return decoded


def make_taat_scorer(
    qmap: dict[int, list[tuple[str, int]]],
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    shard_size: int,
    tomb: np.ndarray | None = None,
    mode: str = "or",
    qreq: dict[int, int] | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """``mode="and"``: posting-list intersection — a doc qualifies only
    when it contains ALL of the query's distinct terms (``qreq[qid]``
    counts them, including terms absent from the corpus, which then
    make the query return empty)."""

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        base = shard * shard_size
        # decode once per (term, salt) row; precompute the tf-part
        pdf = pdf.assign(
            wtf=[
                _wtf(decode_varbyte(t), decode_varbyte(d), k1, b, avgdl)
                for t, d in zip(pdf["tfs"], pdf["dls"])
            ]
        )
        decoded = _decode_rows(pdf, base, tomb)
        out_q: list[int] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        acc = np.zeros(shard_size, dtype=np.float64)
        touched = np.zeros(shard_size, dtype=bool)
        ntm = np.zeros(shard_size, dtype=np.int32) if mode == "and" else None
        for qid, qterms in qmap.items():
            if mode == "and" and qreq is not None and len(qterms) < qreq[qid]:
                continue  # some query term absent from corpus → empty
            hit = False
            for term, qtf in qterms:
                idf = idf_map.get(term)
                if idf is None:
                    continue
                w = qtf * idf
                for ids, wtf in decoded.get(term, []):
                    acc[ids] += w * wtf
                    touched[ids] = True
                    if ntm is not None:
                        ntm[ids] += 1  # salt chunks are doc-disjoint
                    hit = True
            if not hit:
                continue
            all_cand = np.flatnonzero(touched)
            cand = all_cand
            if ntm is not None:
                cand = cand[ntm[cand] == qreq[qid]]
            if cand.size:
                s = acc[cand]
                # deterministic local top-k: (score desc, doc asc)
                order = np.lexsort((cand, -s))[:k]
                out_q.append(qid)
                out_d.append(cand[order] + base)
                out_s.append(s[order])
            # reset only the touched region — O(matched), not
            # O(shard_size), per query (matters for 120-query batches
            # over 1M-doc shards)
            acc[all_cand] = 0.0
            touched[all_cand] = False
            if ntm is not None:
                ntm[all_cand] = 0
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int32"),
                 "doc_int": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.DataFrame(
            {
                "query_id": np.repeat(
                    np.array(out_q, dtype=np.int32),
                    [d.size for d in out_d],
                ),
                "doc_int": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    return score_shard


def make_mixed_scorer(
    qmap_taat: dict[int, list[tuple[str, int]]],
    qmap_bmw: dict[int, list[tuple[str, int]]],
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    shard_size: int,
    tomb: np.ndarray | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Per-query scorer dispatch for ``scorer="auto"`` mixed batches
    (r8, VERDICT r7 #1): selective queries run under the block-max
    (BMW) closure, hot queries under the vectorized TAAT accumulate,
    in ONE scatter over the same pruned postings. Each sub-scorer sees
    only the posting rows of its own queries' terms (a pandas th1
    filter — decode work stays ≈ one scorer's worth; a term shared by
    both subsets is decoded twice, bounded by the query batch).
    Results are the row-concat of the two sub-scorers, both exact and
    rank-identical by the pinned TAAT==BMW invariant."""
    from .wand import make_bmw_scorer

    fn_taat = make_taat_scorer(qmap_taat, idf_map, k1, b, avgdl, k,
                               shard_size, tomb)
    fn_bmw = make_bmw_scorer(qmap_bmw, idf_map, k1, b, avgdl, k,
                             shard_size, tomb)
    h1_taat = {h[0] for qterms in qmap_taat.values() for h, _ in qterms}
    h1_bmw = {h[0] for qterms in qmap_bmw.values() for h, _ in qterms}

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        sub = pdf[pdf["th1"].isin(h1_bmw)]
        if len(sub):
            outs.append(fn_bmw(sub))
        sub = pdf[pdf["th1"].isin(h1_taat)]
        if len(sub):
            outs.append(fn_taat(sub))
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int32"),
                 "doc_int": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        return pd.concat(outs, ignore_index=True)

    return score_shard


def _wtf(tfs: np.ndarray, dls: np.ndarray, k1: float, b: float, avgdl: float):
    t = tfs.astype(np.float64)
    d = dls.astype(np.float64)
    return t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * (d / avgdl)))


def search_index(
    spark: SparkSession,
    index_dir: str,
    queries: str | Sequence[str],
    k: int = 10,
    scorer: str = "taat",
    mode: str = "or",
) -> DataFrame:
    """Top-k over the persisted index. Returns
    (query_id, doc_id <original key>, score), globally tie-broken
    (score desc, doc_id asc per query). ``mode="and"`` = posting-list
    intersection (docs containing ALL distinct query terms; always the
    TAAT scorer).

    One-shot form — re-reads the index tables per call. For repeated /
    interactive queries use :class:`IndexReader`, which pins the
    postings/vocabulary/docmap in executor memory."""
    return _search(
        spark,
        load_meta(index_dir),
        None,
        index_dir,
        queries,
        k,
        scorer,
        mode,
    )


class IndexReader:
    """Warm query handle: index tables cached in executor memory.

    The serving deployment shape — open once, query many times. The
    first search pays cache materialization; subsequent searches scan
    the in-memory columnar cache instead of parquet.

    Snapshot contract: the reader serves the index AS OF open —
    bparts appended by ``append_docs`` after open (and docs removed by
    ``compact_index``'s rewrite) are not visible until reopen (the
    cached relations and the df/parts/docmap caches are all
    open-time snapshots). Tombstones ARE re-read per search (deletes
    mask immediately). Same contract as ``similarity.IvfReader``."""

    DF_CACHE_MAX = 1_000_000  # term-df cache entries (driver memory)
    DOCMAP_CACHE_MAX = 1_000_000  # doc_int -> doc_id entries (driver memory)

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache: bool = True) -> None:
        self.spark = spark
        self.index_dir = index_dir
        self.meta = load_meta(index_dir)
        import os

        self._dfs = {
            "postings": spark.read.parquet(f"{index_dir}/postings"),
            "vocabulary": spark.read.parquet(f"{index_dir}/vocabulary"),
            "docmap": spark.read.parquet(f"{index_dir}/docmap"),
        }
        if ("bparts" not in self._dfs["vocabulary"].columns
                and os.path.isdir(f"{index_dir}/vocab_parts")):
            # r6-layout index (merged vocabulary without the bparts
            # column): the df lookup reads the per-part partials so it
            # also learns which bparts contain each term. r7 indexes
            # carry bparts IN the merged vocabulary — one table serves
            # df + pruning, and the partials need not be persisted.
            self._dfs["vocab_parts"] = spark.read.parquet(
                f"{index_dir}/vocab_parts"
            )
        if cache:
            for df in self._dfs.values():
                df.persist()
        # (th1, th2) -> (document_frequency, containing bparts) or
        # None for absent terms, filled lazily per search.
        # Serving workloads repeat query terms heavily; once a term is
        # cached, searches using only cached terms skip the vocabulary
        # job entirely (one less Spark job per query). Bounded — the
        # full 10^8-term vocabulary never lands on the driver.
        self._df_cache: dict[tuple[int, int], int | None] = {}
        # doc_int -> doc_id for past winners: serving workloads surface
        # hot docs repeatedly; a cached winner skips the docmap job so a
        # fully-warm query is ONE Spark job (the scorer scatter).
        self._docmap_cache: dict[int, str] = {}

    def search(self, queries: str | Sequence[str], k: int = 10,
               scorer: str = "taat", mode: str = "or") -> DataFrame:
        return _search(self.spark, self.meta, self._dfs, self.index_dir,
                       queries, k, scorer, mode, df_cache=self._df_cache,
                       docmap_cache=self._docmap_cache)

    def search_rows(self, queries: str | Sequence[str], k: int = 10,
                    scorer: str = "taat",
                    mode: str = "or") -> "list[tuple[int, str, float]]":
        """Like :meth:`search` but returns the final (query_id, doc_id,
        score) tuples driver-side. On the warm driver-cut path the
        winners are already driver-local, so this skips the
        createDataFrame→collect round-trip — one whole Spark job off
        every warm serving query (the serve loop and the hybrid fold
        consume rows, not a frame)."""
        return _search(self.spark, self.meta, self._dfs, self.index_dir,
                       queries, k, scorer, mode, df_cache=self._df_cache,
                       docmap_cache=self._docmap_cache, return_rows=True)

    def close(self) -> None:
        for df in self._dfs.values():
            df.unpersist()


def _driver_rank_cut(rows, k: int):
    """Per-query rank-≤-k cut with ties kept (score only — the doc_id
    tie-break happens after hydration), numpy-free driver-side
    equivalent of the Spark rank window."""
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    out = []
    for lst in by_q.values():
        lst.sort(key=lambda r: -r["score"])
        if len(lst) > k:
            kth = lst[k - 1]["score"]
            lst = [r for r in lst if r["score"] >= kth]
        out.extend(lst)
    return out


def _search(
    spark: SparkSession,
    meta: dict,
    dfs: dict | None,
    index_dir: str,
    queries: str | Sequence[str],
    k: int,
    scorer: str,
    mode: str = "or",
    df_cache: dict | None = None,
    docmap_cache: dict | None = None,
    return_rows: bool = False,
) -> DataFrame:
    """``return_rows=True`` returns the final results as a driver list
    of (query_id, doc_id, score) tuples instead of a DataFrame. On the
    driver-cut path the winners are ALREADY driver-local after the
    scatter, so this skips the createDataFrame→collect round-trip — a
    whole Spark job off the warm serving path (the fold consumers:
    ``IndexReader.search_rows``, ``hybrid_search_folded``,
    serve_index's plain response)."""
    if isinstance(queries, str):
        queries = [queries]
    from .postings import CODEC_VERSION

    if meta.get("codec_version") != CODEC_VERSION:
        raise ValueError(
            f"index at {index_dir} has codec_version "
            f"{meta.get('codec_version')}, engine expects {CODEC_VERSION} "
            "— rebuild the index"
        )

    def table(name: str) -> DataFrame:
        if dfs is not None:
            return dfs[name]
        return spark.read.parquet(f"{index_dir}/{name}")

    def vocab_parts_table() -> DataFrame | None:
        """Per-part vocab partials, or None on a legacy layout."""
        import os

        if dfs is not None:
            return dfs.get("vocab_parts")
        p = f"{index_dir}/vocab_parts"
        return spark.read.parquet(p) if os.path.isdir(p) else None

    k1, b = meta["k1"], meta["b"]
    avgdl, n_docs = meta["avgdl"], meta["n_docs"]
    shard_size = meta["shard_size"]
    qmap, all_terms = _query_maps(queries, meta["min_token_length"])
    # distinct-term requirement per query for conjunctive mode, counted
    # BEFORE vocabulary filtering (absent terms make "and" empty)
    qreq = {qid: len(qterms) for qid, qterms in qmap.items()}

    def ret_empty():
        if return_rows:
            return []
        return spark.createDataFrame(
            [], "query_id int, doc_id string, score double"
        )

    if not all_terms or n_docs == 0 or avgdl <= 0:
        return ret_empty()

    # hash the query terms exactly as the build did — driver-side
    # (pure-python XXH64 pinned against F.xxhash64; saves a Spark job
    # per search), then slice the hash-keyed vocabulary for their df
    from ..functions.hashing import spark_xxhash64_str, spark_xxhash64_str_int
    from .postings import TERM_HASH_SEED2

    term_to_hash = {
        t: (
            spark_xxhash64_str(t),
            spark_xxhash64_str_int(t, TERM_HASH_SEED2),
        )
        for t in all_terms
    }
    # df per term: serve from the reader's cache where possible (the
    # cache stores the reader's SNAPSHOT of (df, containing bparts),
    # incl. "absent" as None — consistent with the persisted
    # DataFrames); run the lookup job only for terms not seen before.
    # idf is derived fresh from df + current n_docs, so collection
    # stats are never cached. The lookup reads the PER-PART vocabulary
    # partials instead of the merged vocabulary: the global df is their
    # sum by construction (finalize_index builds `vocabulary` as
    # exactly this groupBy-sum), and the same job yields the set of
    # bparts containing each term — the part-level pruning input
    # (VERDICT r5 #3: postings are doc-range-sharded, so without this
    # every search opens every bpart's footers; at 10^4+ parts that
    # fan-out is the latency floor for selective queries).
    df_by_hash: dict[tuple[int, int], int | None] = {}
    parts_by_hash: dict[tuple[int, int], tuple | None] = {}
    missing: list[tuple[int, int]] = []
    for h in term_to_hash.values():
        if df_cache is not None and h in df_cache:
            cached = df_cache[h]
            if cached is None:
                df_by_hash[h] = None
            else:
                df_by_hash[h], parts_by_hash[h] = cached
        else:
            missing.append(h)
    stage_secs: dict[str, float] = {}
    if missing:
        _t_vocab = time.time()
        vp = vocab_parts_table()
        miss_h1 = sorted({h1 for h1, _ in missing})
        miss_set = set(missing)
        vt = table("vocabulary")
        if "bparts" in vt.columns:
            # r7 fast path: the merged vocabulary carries each term's
            # (capped) containing-part list, written at finalize — ONE
            # th1-range-sorted table scan serves df AND the pruning
            # input, instead of fanning out over every vocab_parts
            # partial (at 505 parts that fan-out alone cost ~4.5 s per
            # cold query; at 10⁴ parts it is the latency floor).
            # The exact (th1, th2) pair match runs DRIVER-side over the
            # few th1-matched rows (r8) — the broadcast-join of a tiny
            # literal frame bought nothing but an extra exchange/stage
            # on the cold-query latency path.
            vocab = vt.filter(F.col("th1").isin(miss_h1)).collect()
            found = {}
            for r in vocab:
                if (r["th1"], r["th2"]) not in miss_set:
                    continue  # th1 hash collision with a non-query term
                parts = (None if r["bparts"] is None
                         else tuple(int(p) for p in r["bparts"]))
                found[(r["th1"], r["th2"])] = (
                    int(r["document_frequency"]), parts
                )
        elif vp is not None:
            # the In(th1) filter is PUSHED to the scan (partials are
            # th1-sorted within files → row-group pruning); the exact
            # pair match + per-part df sum fold driver-side (rows per
            # term = its part count)
            vocab = vp.filter(F.col("th1").isin(miss_h1)).collect()
            agg: dict[tuple[int, int], tuple[int, set]] = {}
            for r in vocab:
                key = (r["th1"], r["th2"])
                if key not in miss_set:
                    continue
                df_sum, pset = agg.get(key, (0, set()))
                pset.add(int(r["bpart"]))
                agg[key] = (df_sum + int(r["df"]), pset)
            found = {}
            for key, (df_sum, pset) in agg.items():
                parts = tuple(sorted(pset))
                if len(parts) > PART_PRUNE_MAX_PER_TERM:
                    # a term present in this many parts prunes nothing
                    # — and caching its full part list for 10^6 hot
                    # terms would blow the driver cache; record "all"
                    parts = None
                found[key] = (df_sum, parts)
        else:
            # legacy layout without vocab_parts: merged vocabulary df,
            # no part information (searches scan every bpart)
            vocab = (
                table("vocabulary")
                .filter(F.col("th1").isin(miss_h1))
                .collect()
            )
            found = {
                (r["th1"], r["th2"]): (int(r["document_frequency"]), None)
                for r in vocab
                if (r["th1"], r["th2"]) in miss_set
            }
        for h in missing:
            df_by_hash[h] = found[h][0] if h in found else None
            if h in found:
                parts_by_hash[h] = found[h][1]
        if df_cache is not None and len(df_cache) < IndexReader.DF_CACHE_MAX:
            df_cache.update(
                {
                    h: (None if df_by_hash[h] is None
                        else (df_by_hash[h], parts_by_hash.get(h)))
                    for h in missing
                }
            )
        stage_secs["vocab"] = round(time.time() - _t_vocab, 4)
    for h, df in df_by_hash.items():
        if df is not None and n_docs - df + 0.5 <= 0:
            raise ValueError(
                f"term df={df} exceeds collection size N={n_docs} — the "
                "index has uncompacted deletions/updates whose stale df "
                "breaks the ln-IDF domain; run compact_index first"
            )
    idf_by_hash = {
        h: math.log((n_docs - df + 0.5) / (df + 0.5))
        for h, df in df_by_hash.items()
        if df is not None
    }
    if not idf_by_hash:
        return ret_empty()

    # rewrite query maps onto hash keys
    qmap = {
        qid: [
            (term_to_hash[t], qtf)
            for t, qtf in qterms
            if term_to_hash[t] in idf_by_hash
        ]
        for qid, qterms in qmap.items()
    }
    idf_map = idf_by_hash
    live_h1 = sorted({h1 for h1, _ in idf_by_hash})
    # part-level pruning: read ONLY the bpart= directories that contain
    # at least one live query term (bpart is a partition column — the
    # isin lands in the scan's PartitionFilters, so unrelated parts'
    # files are never opened, footer reads included). Skipped when any
    # live term's part set was too large to track (it spans everything
    # anyway) or when the union itself stops being selective.
    # The prune decision runs BEFORE any relation is created (r8,
    # ADVICE r7): on the one-shot path, eagerly building the root
    # relation first — as r7 did — paid the full partition-directory
    # listing the explicit-path read exists to skip.
    part_sets = [parts_by_hash.get(h) for h in idf_by_hash]
    _LAST_SCAN_INFO.clear()
    # per-stage wall clocks of this search's sequential driver steps
    # (diagnostic, like live_parts — serving observability + the r8
    # latency-floor profile)
    _LAST_SCAN_INFO["stage_seconds"] = stage_secs
    _LAST_SCAN_INFO["live_parts"] = None
    live_parts = None
    if all(ps is not None for ps in part_sets):
        lp = sorted(set().union(*part_sets))
        if len(lp) <= PART_PRUNE_MAX_UNION:
            live_parts = lp
            _LAST_SCAN_INFO["live_parts"] = live_parts
    if live_parts is not None and dfs is None:
        # one-shot path (r7): build the relation from the live bpart
        # directories EXPLICITLY instead of filtering a root read —
        # root relation creation LISTS every partition directory
        # before PartitionFilters apply (measured ~1 s at 505 local
        # parts, and a per-query 10⁴-prefix listing on an object
        # store), all of it for directories the filter then discards.
        # A warm IndexReader amortizes discovery in its persisted
        # relations; this gives the cold path the same locality.
        postings = spark.read.option(
            "basePath", f"{index_dir}/postings"
        ).parquet(*[
            f"{index_dir}/postings/bpart={int(p)}"
            for p in live_parts
        ]).filter(F.col("th1").isin(live_h1))
    else:
        postings = table("postings").filter(F.col("th1").isin(live_h1))
        if live_parts is not None:
            postings = postings.filter(
                F.col("bpart").isin([int(p) for p in live_parts])
            )

    from .postings import load_tombstones

    tomb_set = load_tombstones(index_dir)
    tomb = (
        np.array(sorted(tomb_set), dtype=np.int64) if tomb_set else None
    )

    bmw_qmap: dict | None = None
    if scorer == "auto" and mode != "and":
        # geometry-driven choice (r7, exp_bmw_kernel.py / BENCH.md):
        # BMW only where it measured faster — big shards (long
        # per-shard lists) AND the query selective (its most-selective
        # present term under the df cut). r8 (VERDICT r7 #1): the
        # choice is PER QUERY, not per batch — a mixed batch splits
        # into a BMW subset and a TAAT subset scored in the SAME
        # scatter (one dispatching closure), instead of one hot query
        # forfeiting the measured 2.7× BMW batch win for everyone.
        # Exact either way — the scorers are pinned rank-identical.
        sel_q: dict = {}
        hot_q: dict = {}
        big = shard_size >= AUTO_BMW_MIN_SHARD
        for qid, qterms in qmap.items():
            dfs_q = [df_by_hash[h] for h, _ in qterms
                     if df_by_hash.get(h) is not None]
            frac = (min(dfs_q) / max(n_docs, 1)) if dfs_q else 0.0
            if big and 0.0 < frac <= AUTO_BMW_MAX_DF_FRAC:
                sel_q[qid] = qterms
            else:
                hot_q[qid] = qterms
        if not sel_q:
            scorer = "taat"
        elif not hot_q:
            scorer = "bmw"
        else:
            scorer = "mixed"
            qmap, bmw_qmap = hot_q, sel_q
        _LAST_SCAN_INFO["auto_scorer"] = scorer
        if scorer == "mixed":
            _LAST_SCAN_INFO["auto_bmw_queries"] = sorted(sel_q)

    if mode == "and":
        # intersection needs per-doc matched-term counts → TAAT
        fn = make_taat_scorer(qmap, idf_map, k1, b, avgdl, k, shard_size,
                              tomb, mode="and", qreq=qreq)
    elif scorer == "taat":
        fn = make_taat_scorer(qmap, idf_map, k1, b, avgdl, k, shard_size, tomb)
    elif scorer == "bmw":
        from .wand import make_bmw_scorer

        fn = make_bmw_scorer(qmap, idf_map, k1, b, avgdl, k, shard_size, tomb)
    elif scorer == "mixed":
        fn = make_mixed_scorer(qmap, bmw_qmap, idf_map, k1, b, avgdl, k,
                               shard_size, tomb)
    else:
        raise ValueError(f"unknown scorer {scorer!r}")

    local = postings.groupBy("shard").applyInPandas(fn, schema=RESULT_SCHEMA)

    # The engine-wide tie-break is (score desc, ORIGINAL doc_id asc).
    # doc_int order equals doc_id order only for the initial build —
    # append_docs hands out strictly higher doc_int ranges regardless
    # of key order — so the pre-hydration cut keeps ALL score-ties at
    # the k boundary (rank semantics) and the final cut happens on the
    # hydrated original keys.
    n_shards = max(1, -(-n_docs // shard_size))
    driver_cut = len(queries) * n_shards * k <= DRIVER_CUT_MAX_ROWS
    if driver_cut:
        # small candidate set: collect the shard winners directly and
        # rank-cut on the driver — skips the window's shuffle exchange
        # (one fewer stage on the latency path; p50 matters in serving)
        _t_sc = time.time()
        top_rows = _driver_rank_cut(local.collect(), k)
        stage_secs["scatter"] = round(time.time() - _t_sc, 4)
        if not top_rows:
            return ret_empty()
        # winners are driver-known ids → hydrate driver-side: one
        # pruned docmap scan for cache-missed ids (no join job), zero
        # Spark jobs when every winner is already cached in a warm
        # IndexReader. The docmap is sorted by doc_int, so the isin
        # filter prunes to the few row groups containing misses.
        ids = sorted({int(r["doc_int"]) for r in top_rows})
        known = docmap_cache if docmap_cache is not None else {}
        miss = [i for i in ids if i not in known]
        fetched: dict[int, str] = {}
        if miss:
            _t_hy = time.time()
            rows = (
                _docmap_for_ids(
                    dfs["docmap"] if dfs is not None else None, meta,
                    miss, spark=spark, index_dir=index_dir,
                )
                .select("doc_int", "doc_id")
                .collect()
            )
            stage_secs["hydrate"] = round(time.time() - _t_hy, 4)
            fetched = {int(r["doc_int"]): r["doc_id"] for r in rows}
            if (docmap_cache is not None
                    and len(docmap_cache) < IndexReader.DOCMAP_CACHE_MAX):
                docmap_cache.update(fetched)
        by_q: dict[int, list[tuple[float, str]]] = {}
        for r in top_rows:
            di = int(r["doc_int"])
            did = known.get(di, fetched.get(di))
            if did is None:  # docmap gap — mirror inner-join semantics
                continue
            by_q.setdefault(int(r["query_id"]), []).append(
                (float(r["score"]), did)
            )
        final = []
        for qid in sorted(by_q):
            ranked = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:k]
            final.extend((qid, d, s) for s, d in ranked)
        if not final:
            return ret_empty()
        if return_rows:
            return final  # already (query_id, doc_id, score) tuples
        return spark.createDataFrame(
            final, "query_id int, doc_id string, score double"
        )
    # cluster scale (10^4+ shards): rank in Spark, then hydrate keys
    # from the docmap with an id-pushed filter — the docmap is sorted
    # by doc_int, so parquet min/max stats prune to the few row groups
    # containing winners instead of scanning all 10^12 rows
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc())
    _t_sc = time.time()
    top_rows = (
        local.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
        .collect()
    )
    stage_secs["scatter"] = round(time.time() - _t_sc, 4)
    if not top_rows:
        return ret_empty()
    ids = sorted({int(r["doc_int"]) for r in top_rows})
    tiny = spark.createDataFrame(
        [(int(r["query_id"]), int(r["doc_int"]), float(r["score"]))
         for r in top_rows],
        "query_id int, doc_int long, score double",
    )
    docmap = _docmap_for_ids(
        dfs["docmap"] if dfs is not None else None, meta, ids,
        spark=spark, index_dir=index_dir,
    ).select("doc_int", "doc_id")
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    out = (
        docmap.join(F.broadcast(tiny), "doc_int")
        .select("query_id", "doc_id", "score")
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .drop("rn")
        .orderBy("query_id", F.col("score").desc(), F.col("doc_id").asc())
    )
    if return_rows:
        return [(int(r["query_id"]), r["doc_id"], float(r["score"]))
                for r in out.collect()]
    return out
