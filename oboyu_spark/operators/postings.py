"""Compressed, doc-sharded inverted index — build side (resumable).

Layout (north rule: delta-gap+varbyte postings, per-block max metadata,
explicit salting, checkpoint-resume with per-partition lineage):

    index_dir/
      staged/gen=G/pid=P/*.parquet frozen (doc_id, text, rn) — the
                                   build's deterministic input
                                   snapshot, written in ONE corpus
                                   pass (no pre-count); dense global
                                   ids are doc_int = offsets[pid] + rn
                                   with per-pid offsets (from the
                                   frozen files' counts) in
                                   staged.json; one generation per
                                   build/append; resume and compaction
                                   re-read this, never the live source
      postings/bpart=P/*.parquet   one row per (term-hash, salt-chunk),
                                   rows sorted by th1 for row-group
                                   pruning; each part owns its own root
                                   so part builds run concurrently:
          th1 long, th2 long — 128-bit term hash pair (see below)
          shard long, salt int, n long,
          gaps binary   — delta-gap+varbyte doc ints (ascending)
          tfs binary    — varbyte term frequencies
          dls binary    — varbyte doc lengths (denormalized ⇒ no
                          query-time join against document_stats)
          block_last  array<long> — last doc_int per 128-posting block
          block_maxtf array<long> — max tf per block
          block_mindl array<long> — min dl per block
          (block upper bound = idf · wtf(maxtf, mindl) is computed at
          QUERY time from current k1/b/avgdl — wtf is monotone ↑ in tf
          and ↓ in dl, so the bound stays valid when collection stats
          drift under incremental appends)
      vocab_parts/bpart=P/         per-partition (th1, th2, df, cf)
      vocabulary/                  global merge of the partials; since
                                   r7 th1-range-sorted and carrying
                                   each term's containing-part list
                                   (bparts array<int>, NULL above
                                   PART_PRUNE_MAX_PER_TERM) — one
                                   table serves the query-side df
                                   lookup AND the part-pruning input
      docmap/bpart=P/              (doc_id, doc_int, dl); winner
                                   hydration partition-prunes it via
                                   doc_int // part_docs == bpart
      tombstones/                  deleted doc_ints (applied at decode;
                                   compact() rewrites affected parts)
      manifest/part-P.json         per-partition lineage: input
                                   fingerprint, status, metrics
                                   (docs, tokens, postings, bytes, secs)
      stats/meta.json              global stats + aggregate metrics

Sharding is RANGE on dense doc ids (shard = doc_int // shard_size): each
shard is a partition-local index over a contiguous doc range (dense
query-side accumulators), and appends claim fresh id ranges → fresh
build partitions → existing shards are immutable.

A "build partition" (bpart) is ``shards_per_part`` consecutive shards:
the unit of checkpoint-resume. Killing a build and re-running
``build_index`` skips every bpart whose manifest row is already
``done`` and converges to the same index (pinned by tests).

Salting: a term whose global-ish df (within-part df here — at 10^12
scale parts are large enough that hot terms are hot in every part)
exceeds ``salt_chunk`` is split into range-disjoint sub-chunks BEFORE
the build shuffle, bounding every reducer group even for stop-word
terms. Chunks stay ordered and disjoint → block-max skipping sees one
ordered stream.

The reference's analog of this file is the in-memory dict index build
(inverted_index_builder.py:50-68, bm25_indexer.py:121-233) plus the
file_metadata change tracking (change_detector.py:64-105); everything
here is a from-scratch Spark design, not a port.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import B_DEFAULT, K1_DEFAULT, MIN_TOKEN_LENGTH_DEFAULT
from .codec import encode_doc_ids, encode_varbyte

BLOCK = 128
CODEC_VERSION = 3

# Terms are stored as a 128-bit hash pair (two independent xxhash64
# passes), NOT as strings. Rationale (measured in this sandbox, and the
# same physics holds on a real cluster): every wide stage of the build
# — the (doc, term) tf aggregate, the vocab partial, the encode shuffle
# — then runs on fixed-width primitive keys, which Tungsten hash-
# aggregates without per-row string allocation (string-keyed explode+
# groupBy anti-scaled 2x at high thread counts here). Query terms are
# hashed the same way at lookup; a wrong merge needs BOTH 64-bit hashes
# to collide (~2^-128 per term pair), far below the float-noise floor
# of score parity. The human-readable vocabulary lives in the separate
# relational vocabulary table, not in the index hot path.
POSTINGS_SCHEMA = (
    "shard long, th1 long, th2 long, salt int, n long, "
    "gaps binary, tfs binary, dls binary, "
    "block_last array<long>, block_maxtf array<long>, block_mindl array<long>"
)

TERM_HASH_SEED2 = 7  # second hash = xxhash64(term, 7); first = xxhash64(term)


def term_hash_cols(term_col):
    return (
        F.xxhash64(term_col).alias("th1"),
        F.xxhash64(term_col, F.lit(TERM_HASH_SEED2)).alias("th2"),
    )


def _encode_posting_list(ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """One sorted posting list → (n, gaps, tfs, dls, blast, bmaxtf,
    bmindl)."""
    n = ids.size
    n_blocks = (n + BLOCK - 1) // BLOCK
    block_last = [int(ids[min((i + 1) * BLOCK, n) - 1]) for i in range(n_blocks)]
    block_maxtf = [int(tfs[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(n_blocks)]
    block_mindl = [int(dls[i * BLOCK : (i + 1) * BLOCK].min()) for i in range(n_blocks)]
    return (
        n,
        encode_doc_ids(ids.astype(np.uint64)),
        encode_varbyte(tfs.astype(np.uint64)),
        encode_varbyte(dls.astype(np.uint64)),
        block_last,
        block_maxtf,
        block_mindl,
    )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-(shard,term,salt)-group encoder (applyInPandas shape) —
    kept for tests/tools; the build uses the streaming partition
    encoder below, which has no per-group Arrow/pandas machinery."""
    pdf = pdf.sort_values("doc_int")
    n, gaps, tfs_b, dls_b, blast, bmaxtf, bmindl = _encode_posting_list(
        pdf["doc_int"].to_numpy(np.int64),
        pdf["tf"].to_numpy(np.int64),
        pdf["dl"].to_numpy(np.int64),
    )
    return pd.DataFrame(
        {
            "shard": [int(pdf["shard"].iloc[0])],
            "th1": [int(pdf["th1"].iloc[0])],
            "th2": [int(pdf["th2"].iloc[0])],
            "salt": [int(pdf["salt"].iloc[0])],
            "n": [n],
            "gaps": [gaps],
            "tfs": [tfs_b],
            "dls": [dls_b],
            "block_last": [blast],
            "block_maxtf": [bmaxtf],
            "block_mindl": [bmindl],
        }
    )


def _encode_frame_loop(pdf: pd.DataFrame, bounds: np.ndarray) -> pd.DataFrame:
    """Per-group-loop encoder — the readable oracle `_encode_frame` is
    pinned byte-identical against (test_codec); not on the hot path."""
    shard = pdf["shard"].to_numpy(np.int64)
    th1 = pdf["th1"].to_numpy(np.int64)
    th2 = pdf["th2"].to_numpy(np.int64)
    salt = pdf["salt"].to_numpy(np.int64)
    di = pdf["doc_int"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.int64)
    dl = pdf["dl"].to_numpy(np.int64)
    out: dict[str, list] = {k: [] for k in (
        "shard", "th1", "th2", "salt", "n", "gaps", "tfs", "dls",
        "block_last", "block_maxtf", "block_mindl")}
    for s, e in zip(bounds[:-1], bounds[1:]):
        n, gaps, tfs_b, dls_b, blast, bmaxtf, bmindl = _encode_posting_list(
            di[s:e], tf[s:e], dl[s:e]
        )
        out["shard"].append(int(shard[s]))
        out["th1"].append(int(th1[s]))
        out["th2"].append(int(th2[s]))
        out["salt"].append(int(salt[s]))
        out["n"].append(n)
        out["gaps"].append(gaps)
        out["tfs"].append(tfs_b)
        out["dls"].append(dls_b)
        out["block_last"].append(blast)
        out["block_maxtf"].append(bmaxtf)
        out["block_mindl"].append(bmindl)
    return pd.DataFrame(out)


def _encode_frame(pdf: pd.DataFrame, bounds: np.ndarray) -> pd.DataFrame:
    """Encode every complete group in ``pdf`` (rows pre-sorted by
    (shard, th1, th2, salt, doc_int); ``bounds`` = group start indices
    plus the end sentinel) — FULLY VECTORIZED across groups.

    The r4 encoder looped Python-side over groups (3 codec calls +
    list building each); at real-corpus vocabulary scale that loop IS
    the build (measured 6.6k groups/s/core on 2-row groups — the
    wide-vocab bench shape). This version runs zero per-group Python:

    - gaps for ALL lists at once (delta within the frame, group-start
      positions overwritten with their absolute id),
    - THREE `encode_varbyte_buf` calls for the whole frame; varbyte is
      per-value independent, so each group's bytes are the contiguous
      slice given by the cumulative byte counts,
    - block metadata via `np.maximum/minimum.reduceat` over the global
      block-start index (blocks tile the frame contiguously, so the
      reduceat intervals are exactly the 128-posting blocks).

    Byte-identical to `_encode_frame_loop` (pinned by test_codec)."""
    m = len(bounds) - 1
    if m <= 0 or len(pdf) == 0:
        return _encode_frame_loop(pdf, bounds)
    from .codec import encode_varbyte_buf

    starts = np.asarray(bounds[:-1], dtype=np.int64)
    ends = np.asarray(bounds[1:], dtype=np.int64)
    counts = ends - starts
    di = pdf["doc_int"].to_numpy(np.int64)
    tf = pdf["tf"].to_numpy(np.int64)
    dl = pdf["dl"].to_numpy(np.int64)

    d = di.astype(np.uint64)
    gaps = np.empty_like(d)
    # cross-group deltas may wrap (uint); those positions are exactly
    # the group starts and are overwritten with the absolute first id
    gaps[1:] = d[1:] - d[:-1]
    gaps[starts] = d[starts]
    gbuf, gnb = encode_varbyte_buf(gaps)
    tbuf, tnb = encode_varbyte_buf(tf.astype(np.uint64))
    dbuf, dnb = encode_varbyte_buf(dl.astype(np.uint64))

    def slices(buf: np.ndarray, nb: np.ndarray) -> list:
        cum = np.zeros(len(nb) + 1, dtype=np.int64)
        np.cumsum(nb, out=cum[1:])
        raw = buf.tobytes()
        return [raw[a:b] for a, b in zip(cum[starts].tolist(),
                                         cum[ends].tolist())]

    nblocks = (counts + BLOCK - 1) // BLOCK
    cumb = np.cumsum(nblocks)
    first_block = cumb - nblocks
    gidx = np.repeat(np.arange(m), nblocks)
    within = np.arange(int(cumb[-1]), dtype=np.int64) - first_block[gidx]
    bstart = starts[gidx] + within * BLOCK
    bend = np.minimum(bstart + BLOCK, ends[gidx])
    blast = di[bend - 1]
    bmaxtf = np.maximum.reduceat(tf, bstart)
    bmindl = np.minimum.reduceat(dl, bstart)
    splits = cumb[:-1]

    return pd.DataFrame({
        "shard": pdf["shard"].to_numpy(np.int64)[starts],
        "th1": pdf["th1"].to_numpy(np.int64)[starts],
        "th2": pdf["th2"].to_numpy(np.int64)[starts],
        "salt": pdf["salt"].to_numpy(np.int64)[starts],
        "n": counts,
        "gaps": slices(gbuf, gnb),
        "tfs": slices(tbuf, tnb),
        "dls": slices(dbuf, dnb),
        "block_last": np.split(blast, splits),
        "block_maxtf": np.split(bmaxtf, splits),
        "block_mindl": np.split(bmindl, splits),
    })


def _encode_stream(batches):
    """Streaming partition encoder (mapInPandas): rows arrive sorted by
    (shard, th1, th2, salt, doc_int) within the partition; groups are
    detected by key change-points in numpy and encoded in bulk — no
    per-group Arrow round-trip, no per-group pandas construction. The
    tail group of each Arrow batch is carried into the next batch
    (groups may span batch boundaries). At real-corpus vocabulary scale
    (10^8+ (term, shard, salt) groups per part) this is the difference
    between a vectorized pass and 10^8 tiny applyInPandas invocations.
    """
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        n = len(pdf)
        if n == 0:
            continue
        keys = pdf[["shard", "th1", "th2", "salt"]].to_numpy()
        change = np.flatnonzero((keys[1:] != keys[:-1]).any(axis=1)) + 1
        last_start = int(change[-1]) if change.size else 0
        carry = pdf.iloc[last_start:].reset_index(drop=True)
        if last_start:
            bounds = np.concatenate([[0], change[change < last_start],
                                     [last_start]]).astype(np.int64)
            yield _encode_frame(pdf.iloc[:last_start], bounds)
    if carry is not None and len(carry):
        keys = carry[["shard", "th1", "th2", "salt"]].to_numpy()
        change = np.flatnonzero((keys[1:] != keys[:-1]).any(axis=1)) + 1
        bounds = np.concatenate([[0], change, [len(carry)]]).astype(np.int64)
        yield _encode_frame(carry, bounds)


def wtf_upper(maxtf, mindl, k1: float, b: float, avgdl: float):
    """Monotone upper bound of the BM25 tf-part for a block."""
    t = np.asarray(maxtf, dtype=np.float64)
    d = np.asarray(mindl, dtype=np.float64)
    return t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * (d / avgdl)))


def shuffle_bytes(spark: SparkSession) -> tuple[int, int] | None:
    """Cumulative (shuffle write, shuffle read) bytes for this app from
    the live AppStatusStore — the north rule asks for shuffle bytes in
    the per-partition build metrics. Best-effort (internal API): returns
    None if the py4j path changes across Spark versions."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        jvm, gw = sc._jvm, sc._gateway
        stages = store.stageList(
            jvm.java.util.ArrayList(), False, False,
            gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )
        tw = tr = 0
        for i in range(stages.size()):
            s = stages.apply(i)
            tw += s.shuffleWriteBytes()
            tr += s.shuffleReadBytes()
        return int(tw), int(tr)
    except Exception:
        return None


def _manifest_path(index_dir: str, p: int) -> str:
    return f"{index_dir}/manifest/part-{p:05d}.json"


def _read_manifest(index_dir: str, p: int) -> dict | None:
    try:
        with open(_manifest_path(index_dir, p)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_manifest(index_dir: str, p: int, row: dict) -> None:
    os.makedirs(f"{index_dir}/manifest", exist_ok=True)
    tmp = _manifest_path(index_dir, p) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(row, fh, indent=2)
    os.replace(tmp, _manifest_path(index_dir, p))


def _tag_local_ids(df: DataFrame) -> DataFrame:
    """(pid, rn): partition id + local row index, assigned inside the
    SAME pass that writes staged. Global ids are NOT assigned here —
    they're derived later as offsets[pid] + rn, where offsets come from
    per-pid counts of the WRITTEN (frozen) files. This kills the
    pre-write count() of the source (a full corpus pass at 100 TB just
    to size id strides) while staying sound: the unsound variant is
    collecting counts from a *recomputable* shuffle between two
    actions; counting the immutable staged parquet is not that.

    r8 (guide §4): the tag is two JVM integer expressions over
    ``monotonically_increasing_id()`` — whose value IS
    (partition id << 33) | within-partition row index — instead of a
    mapInPandas wrapper, which round-tripped every corpus text byte
    JVM→Python→JVM just to attach two integers. Same recompute
    contract as before (the id source is nondeterministic under
    retries either way, which is exactly why ids are always re-derived
    from the FROZEN written files, never from this live expression).
    Row-index width caps a staging partition at 2^33 rows — far above
    any real per-partition row count."""
    mid = F.monotonically_increasing_id()
    tagged = df.withColumn("__mid", mid)
    return tagged.select(
        *df.columns,
        F.shiftrightunsigned(F.col("__mid"), 33).cast("int").alias("pid"),
        F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("rn"),
    )


def _stage_docs(
    keyed: DataFrame,
    index_dir: str,
    part_docs: int,
    num_partitions: int,
    base: int,
    gen: int,
) -> tuple[int, list[int], dict[int, int]]:
    """ONE corpus pass: range-sort by key, tag (pid, rn), write
    partitioned by pid under ``staged/gen=<gen>``. Global ids are DENSE
    and ascending in key order: doc_int = offsets[pid] + rn with
    offsets = base + cumulative per-pid counts. The read-back that
    derives offsets and runs the integrity gate reads ONLY (pid, rn)
    and doc_id — parquet column pruning keeps the text bytes (the bulk
    at 100 TB) untouched. Returns (n_docs, parts, offsets)."""
    spark = keyed.sparkSession
    gdir = f"{index_dir}/staged/gen={gen}"
    # the range-sort's boundary sample would otherwise materialize the
    # source pipeline a second time (at 100 TB the source is often a
    # transform, not a bare scan); MEMORY_AND_DISK never recomputes —
    # worst case it spills the corpus to local disk once, which is
    # cheaper than re-running the source pipeline
    from pyspark import StorageLevel

    keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        tagged = _tag_local_ids(
            keyed.repartitionByRange(num_partitions, "doc_id")
            .sortWithinPartitions("doc_id")
        )
        tagged.write.mode("overwrite").partitionBy("pid").parquet(gdir)
    finally:
        keyed.unpersist()
    # zero-row input writes only _SUCCESS — no pid=* dirs to infer a
    # schema from; return the empty staging gracefully (round-1 parity)
    if not any(f.startswith("pid=") for f in os.listdir(gdir)):
        return 0, [], {}
    back = spark.read.parquet(gdir)
    # one integrity/offsets job: range partitioning puts EQUAL keys in
    # the same pid, so global key-distinctness == Σ per-pid distincts
    per_pid = {
        int(r["pid"]): (int(r["n"]), int(r["mx"]), int(r["nk"]))
        for r in back.groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("rn").alias("mx"),
            F.countDistinct("doc_id").alias("nk"),
        )
        .collect()
    }
    n_docs = sum(n for n, _, _ in per_pid.values())
    if n_docs == 0:
        return 0, [], {}
    for pid, (n, mx, nk) in sorted(per_pid.items()):
        if mx != n - 1:
            raise RuntimeError(
                f"staging integrity violation: gen {gen} pid {pid} holds "
                f"{n} rows but max rn is {mx} (expected {n - 1})"
            )
        if nk != n:
            raise RuntimeError(
                f"staging integrity violation: gen {gen} pid {pid} holds "
                f"{n} rows but {nk} distinct keys"
            )
    offsets: dict[int, int] = {}
    acc = base
    for pid in sorted(per_pid):
        offsets[pid] = acc
        acc += per_pid[pid][0]
    parts = list(range(base // part_docs, (acc - 1) // part_docs + 1))
    return n_docs, parts, offsets


def _staged_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/staged.json") as fh:
        return json.load(fh)


def staged_part_df(spark: SparkSession, index_dir: str, p: int,
                   smeta: dict | None = None) -> DataFrame:
    """The frozen input slice of build partition ``p``:
    (doc_id, text, doc_int), doc_int derived from the staged offsets.
    Generations are part-aligned (every append base is a part
    boundary), so exactly one generation covers a part; within it only
    the pids overlapping the part's id range are read (directory-level
    partition pruning on pid)."""
    smeta = smeta or _staged_meta(index_dir)
    part_docs = smeta["shard_size"] * smeta["shards_per_part"]
    lo, hi = p * part_docs, (p + 1) * part_docs
    for g in smeta["gens"]:
        if g["base"] <= lo < g["base"] + g["n"]:
            break
    else:
        raise ValueError(f"part {p} is not covered by any staged generation")
    offs = sorted((int(k), int(v)) for k, v in g["offsets"].items())
    sel: list[int] = []
    sel_offs: dict[int, int] = {}
    for i, (pid, off) in enumerate(offs):
        pid_end = offs[i + 1][1] if i + 1 < len(offs) else g["base"] + g["n"]
        if off < hi and pid_end > lo:
            sel.append(pid)
            sel_offs[pid] = off
    sub = spark.read.parquet(f"{index_dir}/staged/gen={g['gen']}").filter(
        F.col("pid").isin(sel)
    )
    omap = F.create_map(
        *[x for pid in sel for x in (F.lit(pid), F.lit(sel_offs[pid]))]
    )
    sub = sub.withColumn("doc_int", omap[F.col("pid")] + F.col("rn"))
    return sub.filter((F.col("doc_int") >= lo) & (F.col("doc_int") < hi))


def _stage(
    docs: DataFrame,
    index_dir: str,
    id_col: str,
    text_col: str,
    shard_size: int,
    shards_per_part: int,
    id_assign_partitions: int | None,
) -> dict:
    """Freeze the input: strided ids + bpart partitions, written once."""
    staged_meta_path = f"{index_dir}/staged.json"
    if os.path.exists(staged_meta_path):
        with open(staged_meta_path) as fh:
            return json.load(fh)
    # no staged.json → any staged files are a partial crashed write
    import shutil

    shutil.rmtree(f"{index_dir}/staged", ignore_errors=True)
    spark = docs.sparkSession
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    num_partitions = id_assign_partitions or spark.sparkContext.defaultParallelism
    part_docs = shard_size * shards_per_part
    n_docs, parts, offsets = _stage_docs(
        keyed, index_dir, part_docs, num_partitions, 0, 0
    )
    meta = {
        "n_docs": int(n_docs),
        "parts": parts,
        "shard_size": shard_size,
        "shards_per_part": shards_per_part,
        "gens": [
            {"gen": 0, "base": 0, "n": int(n_docs),
             "offsets": {str(k): int(v) for k, v in offsets.items()}}
        ],
    }
    tmp = staged_meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, staged_meta_path)
    return meta


def _build_one_part(
    spark: SparkSession,
    index_dir: str,
    p: int,
    shard_size: int,
    salt_chunk: int,
    min_token_length: int,
    stop_words,
) -> dict:
    """Build postings + vocab partial + docmap for one bpart.

    Shuffle budget (the thing that matters at 100 TB): doc length is
    carried through tokenization (dl = size of the filtered token
    array, computed BEFORE the explode) so no join against
    document_stats is ever needed; salting uses a driver-collected
    broadcast map of the few hot terms (df > salt_chunk) so no join
    against the vocabulary either. Net per part: ONE wide shuffle of
    (doc, dl, term) for the tf aggregate, one small term-agg shuffle
    for the vocab partial, and the (shard, term, salt) encode shuffle.
    """
    t0 = time.time()
    sh0 = shuffle_bytes(spark)
    sub = staged_part_df(spark, index_dir, p)

    from .termindex import with_tokens

    # fp = whitespace-normalized content hash, the change-detection key
    # (reference change_detector.py:64-105 uses file hashes; here the
    # doc IS the unit) — sync_docs diffs against it without ever
    # re-reading staged text. Computed HERE, in the same projection as
    # tokenization, so the raw text column can be DROPPED before the
    # persist: the cached frame carries (ids, dl, fp, tokens) instead
    # of text + tokens (≈2× the text bytes), and the docmap/stats/tf
    # consumers below never touch the wide column again.
    from ..functions.text import collapse_whitespace

    from pyspark.sql.types import ArrayType

    if isinstance(sub.schema["text"].dataType, ArrayType):
        # PRE-TOKENIZED input (array<string> text column): the caller
        # already ran the tokenizer — pass the array through. The
        # change-detection fingerprint hashes the space-joined token
        # stream (consistent for any index built from the same
        # pretokenized source; don't mix raw-text and pretokenized
        # builds of one index). Used by scaling_bench's compute-phase
        # isolation (VERDICT r6 #7): the timed parts phase is then the
        # aggregate+encode compute, with the regex tokenizer out of
        # the measurement.
        toks = (
            sub.withColumn("tokens", F.col("text"))
            .withColumn("dl", F.size("tokens"))
            .withColumn("fp", F.md5(F.concat_ws(" ", F.col("text"))))
            .drop("text")
        )
    else:
        toks = (
            with_tokens(sub, "text", "tokens", min_token_length, stop_words)
            .withColumn("dl", F.size("tokens"))
            .withColumn("fp", F.md5(collapse_whitespace(F.col("text"))))
            .drop("text")
        )
    toks = toks.persist()
    steps: dict[str, float] = {}

    # docmap for this part — straight projection, no join, no agg; the
    # per-part (n_docs, tokens) stats ride the SAME action as an
    # Observation (r8: one fewer barrier per part — the standalone
    # toks.agg job re-scanned the persisted frame just for two
    # scalars). observe() sits ABOVE the range exchange so its
    # accumulators never see the exchange's boundary-sampling pass.
    # The write is submitted from a helper thread (r8 cont., guide
    # §2.6): it shares no dependency with the tf→encode chain below, so
    # Spark schedules its stages alongside the tf aggregate instead of
    # serializing the whole docmap write onto the part's critical path
    # (~1.5 s of a ~9 s part wall at bench geometry, and the straggler
    # tail of every multi-part build). Both consumers materialize the
    # SAME persisted `toks` frame — block-level cache locks make one
    # computation win, so tokenization still runs once. step_seconds
    # are per-step wall clocks; docmap now overlaps tf_vocab.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    obs_dm = Observation()

    def _write_docmap() -> None:
        t_dm = time.time()
        toks.select(
            "doc_id", "doc_int", F.col("dl").cast("long").alias("dl"), "fp",
        ) \
            .repartitionByRange(4, "doc_int").sortWithinPartitions("doc_int") \
            .observe(
                obs_dm,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("tokens"),
            ) \
            .write.mode("overwrite").parquet(f"{index_dir}/docmap/bpart={p}")
        steps["docmap"] = round(time.time() - t_dm, 3)

    dm_pool = ThreadPoolExecutor(max_workers=1)
    dm_fut = dm_pool.submit(_write_docmap)
    t_s = time.time()

    try:
        # term strings leave the pipeline HERE: everything downstream keys
        # on the fixed-width 128-bit hash pair (see POSTINGS_SCHEMA note)
        tf = (
            toks.select(
                "doc_int",
                F.col("dl").cast("long").alias("dl"),
                F.explode("tokens").alias("term"),
            )
            .select("doc_int", "dl", *term_hash_cols(F.col("term")))
            .groupBy("doc_int", "dl", "th1", "th2")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        )
        tf = tf.persist()

        vocab_part = tf.groupBy("th1", "th2").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").alias("cf"),
        )
        # th1-sorted within files so the query-side df/part lookup prunes
        # row groups on its pushed In(th1) filter — same device as the
        # postings payload (searchidx reads vocab_parts, not vocabulary).
        # The hot-term (skew) set rides the same action as an Observation
        # (r8) — the separate filter+collect job re-ran the vocab
        # aggregation; hot terms are few by definition (df > salt_chunk),
        # so the collect_list stays tiny.
        obs_vp = Observation()
        vocab_part.sortWithinPartitions("th1").observe(
            obs_vp,
            F.collect_list(
                F.when(F.col("df") > salt_chunk, F.struct("th1", "th2", "df"))
            ).alias("hot"),
        ).write.mode("overwrite").parquet(
            f"{index_dir}/vocab_parts/bpart={p}"
        )

        # hot terms (the skew set) are few — broadcast map, no join
        hot = [
            (int(r["th1"]), int(r["th2"]), min(-(-int(r["df"]) // salt_chunk), 64))
            for r in obs_vp.get["hot"]
        ]
        steps["tf_vocab"] = round(time.time() - t_s, 3)
        t_s = time.time()
        if hot:
            hot_df = spark.createDataFrame(
                hot, "th1 long, th2 long, salt_count long"
            )
            tf_s = tf.join(F.broadcast(hot_df), ["th1", "th2"], "left").withColumn(
                "salt_count", F.coalesce("salt_count", F.lit(1))
            )
        else:
            tf_s = tf.withColumn("salt_count", F.lit(1))

        enriched = tf_s.select(
            "th1", "th2", "doc_int", "tf", "dl",
            (F.col("doc_int") / shard_size).cast("long").alias("shard"),
            (
                (F.pmod(F.col("doc_int"), F.lit(shard_size)) * F.col("salt_count"))
                / F.lit(shard_size)
            ).cast("int").alias("salt"),
        )
        # ONE encode shuffle: repartition by the FULL group key, sort groups
        # contiguous, stream-encode whole partitions (no per-group
        # applyInPandas — see _encode_stream), and the output is ALREADY
        # sorted by th1 within each file for row-group pruning, so no
        # post-encode repartition. th1-first sort nesting: groups stay
        # contiguous (full group key in the sort) AND files keep ascending
        # th1 → tight parquet row-group min/max for the query-side term
        # filter (each file holds a hash-scattered SUBSET of terms, but the
        # rows within it are th1-sorted, so row groups still cover narrow
        # disjoint th1 ranges).
        # Partitioning key (r8): hashing on `shard` alone capped the encode
        # stage's parallelism at the part's shard count — 6 tasks for the
        # wide-vocab bench geometry, ONE task for a 130k-doc big-shard part
        # — which is the measured wide-vocab scaling floor (VERDICT r7 #2:
        # 2→8 cores = 0.54). Groups only need to be contiguous within a
        # partition, not co-located per shard (the query side re-groups by
        # shard anyway), so hashing the full (shard, th1, th2, salt) key
        # spreads the ~|vocab| tiny posting groups evenly over a
        # scale-adaptive task count (≥ cluster parallelism, never fewer
        # than the shard count) and also de-skews hot salted terms.
        n_enc = ENCODE_PARTITIONS or max(
            _spp(index_dir), spark.sparkContext.defaultParallelism
        )
        postings = (
            enriched.repartition(max(2, n_enc), "shard", "th1", "th2", "salt")
            .sortWithinPartitions("th1", "th2", "salt", "shard", "doc_int")
            .mapInPandas(_encode_stream, schema=POSTINGS_SCHEMA)
        )
        # each part owns its own postings root → part builds can run
        # CONCURRENTLY (disjoint output paths, no shared-directory
        # partition-overwrite semantics to get wrong); readers discover
        # bpart=*/ via normal partition inference.
        # The manifest counters ride the write as an Observation (r8
        # cont.): the separate read-back job existed only to fetch three
        # sums (~0.3 s/part of pure job latency). Sibling-wipe detection is
        # unchanged — finalize_index still reads the FINAL postings dir and
        # compares it against these claimed counts.
        obs_po = Observation()
        postings.observe(
            obs_po,
            F.count(F.lit(1)).alias("rows"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("postings"),
            F.coalesce(
                F.sum(F.length("gaps") + F.length("tfs") + F.length("dls")),
                F.lit(0),
            ).alias("bytes"),
        ).write.mode("overwrite").parquet(f"{index_dir}/postings/bpart={p}")
        steps["encode"] = round(time.time() - t_s, 3)
    finally:
        # join the overlapped docmap write before leaving the part (on
        # the error path its own failure must not mask the chain's)
        dm_err = dm_fut.exception()
        dm_pool.shutdown()
    if dm_err is not None:
        raise dm_err
    dm_stats = obs_dm.get
    n_docs_part, tokens_part = int(dm_stats["n"]), int(dm_stats["tokens"])

    toks.unpersist()
    tf.unpersist()
    agg = obs_po.get
    elapsed = time.time() - t0
    sh1 = shuffle_bytes(spark)
    # NB: with concurrent part builds the app-level delta attributes
    # overlapping stages to whichever part reads it — per-part shuffle
    # bytes are exact only in sequential builds; totals always are.
    shuffle_w = (sh1[0] - sh0[0]) if (sh0 and sh1) else None
    shuffle_r = (sh1[1] - sh0[1]) if (sh0 and sh1) else None
    return {
        "bpart": p,
        "status": "done",
        "n_docs": int(n_docs_part),
        "tokens": tokens_part,
        "shuffle_write_bytes": shuffle_w,
        "shuffle_read_bytes": shuffle_r,
        "posting_rows": int(agg["rows"]),
        "n_postings": int(agg["postings"]),
        "compressed_payload_bytes": int(agg["bytes"]),
        "build_seconds": round(elapsed, 3),
        "step_seconds": steps,
        "docs_per_sec": round(n_docs_part / elapsed, 2) if elapsed > 0 else None,
        "tokens_per_sec": round(tokens_part / elapsed, 2) if elapsed > 0 else None,
    }


# A/B override for the encode-stage partition count (None = one
# partition per shard, i.e. shards_per_part). Experiment-only knob.
ENCODE_PARTITIONS: "int | None" = None

_SPP_CACHE: dict[str, int] = {}


def _spp(index_dir: str) -> int:
    if index_dir not in _SPP_CACHE:
        with open(f"{index_dir}/staged.json") as fh:
            _SPP_CACHE[index_dir] = json.load(fh)["shards_per_part"]
    return _SPP_CACHE[index_dir]


def _merged_vocab_frame(spark: SparkSession, index_dir: str) -> DataFrame:
    """The merged-vocabulary frame finalize_index writes (exposed for
    the plan gate: test_plan_shapes pins that the merge carries NO
    range exchange — a range exchange's boundary sampler executes the
    whole merge aggregation a second time)."""
    vocab_schema = (
        "th1 long, th2 long, document_frequency long, "
        "collection_frequency long, bparts array<int>"
    )
    if os.path.isdir(f"{index_dir}/vocab_parts"):
        # bparts (r7): the merged vocabulary CARRIES each term's
        # containing-part list, so the query-side df lookup is ONE
        # range-sorted table scan instead of a fan-out over every
        # vocab_parts partial — at 505 parts the partial fan-out alone
        # cost ~4.5 s/cold query (exp_part_prune), at 10⁴ parts it IS
        # the latency floor. Hot terms present in more parts than
        # PART_PRUNE_MAX_PER_TERM store NULL (they prune nothing and
        # their full lists would make the vocabulary O(vocab·parts)).
        # Consistency: every mutation path (build/append/sync/compact)
        # ends in finalize_index, so the merged list can never go
        # stale ahead of the postings layout; delete_docs only
        # tombstones (pruning stays correct, merely looser).
        from .searchidx import PART_PRUNE_MAX_PER_TERM as _CAP

        nparts = max(4, int(spark.sparkContext.defaultParallelism) // 4)
        vocab = (
            spark.read.parquet(f"{index_dir}/vocab_parts")
            .groupBy("th1", "th2")
            .agg(
                F.sum("df").alias("document_frequency"),
                F.sum("cf").alias("collection_frequency"),
                F.sort_array(F.collect_set(F.col("bpart").cast("int")))
                .alias("ba"),
            )
            .withColumn(
                "bparts",
                F.when(F.size("ba") <= F.lit(_CAP), F.col("ba")),
            )
            .drop("ba")
            # th1-HASH-partitioned, th1-sorted WITHIN files (r8 cont.):
            # the lookup's pushed In(th1) filter prunes via row-group
            # min/max stats, which only need the within-file sort order
            # — the same device as the encode stage's output files. The
            # previous repartitionByRange bought globally disjoint file
            # ranges at the cost of the range sampler EXECUTING THE
            # MERGE AGGREGATION A SECOND TIME (a range exchange samples
            # its child plan to pick boundaries; the child here is the
            # whole groupBy + collect_set reduce, not a cached scan).
            .repartition(nparts, "th1")
            .sortWithinPartitions("th1", "th2")
        )
    else:
        vocab = spark.createDataFrame([], vocab_schema)
    return vocab


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    k1: float,
    b: float,
    min_token_length: int,
    shard_size: int,
    salt_chunk: int,
) -> dict:
    """Merge vocab partials, compute collection stats, write meta."""
    vocab = _merged_vocab_frame(spark, index_dir)
    # the vocab merge shares nothing with the docmap stats / integrity
    # jobs below — run it on a helper thread so Spark schedules them
    # together (guide §2.6) instead of three sequential barriers
    from concurrent.futures import ThreadPoolExecutor

    fin_pool = ThreadPoolExecutor(max_workers=1)
    vocab_fut = fin_pool.submit(
        lambda: vocab.write.mode("overwrite").parquet(
            f"{index_dir}/vocabulary"
        )
    )
    try:
        if os.path.isdir(f"{index_dir}/docmap"):
            docmap = spark.read.parquet(f"{index_dir}/docmap")
        else:
            docmap = spark.createDataFrame(
                [], "doc_id string, doc_int long, dl long, fp string"
            )
        tomb = load_tombstones(index_dir)
        if tomb:
            docmap = docmap.filter(
                ~F.col("doc_int").isin([int(x) for x in tomb])
            )
        cs = docmap.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("total"),
        ).collect()[0]
        n_docs, total_terms = int(cs["n"]), int(cs["total"])
        avgdl = total_terms / n_docs if n_docs else 0.0

        parts = []
        mdir = f"{index_dir}/manifest"
        if os.path.isdir(mdir):
            for fn in sorted(os.listdir(mdir)):
                if fn.endswith(".json"):
                    with open(f"{mdir}/{fn}") as fh:
                        parts.append(json.load(fh))
        total_secs = sum(pm.get("build_seconds", 0) for pm in parts)

        # integrity gate: the FINAL postings dir must hold exactly the
        # sum of what the per-part manifests claim (guards against
        # partition-overwrite modes silently wiping sibling shards)
        manifest_postings = sum(pm.get("n_postings", 0) for pm in parts)
        try:
            final_postings = int(
                spark.read.parquet(f"{index_dir}/postings")
                .agg(F.coalesce(F.sum("n"), F.lit(0)))
                .collect()[0][0]
            )
        except Exception:
            final_postings = 0
    finally:
        vocab_err = vocab_fut.exception()
        fin_pool.shutdown()
    if vocab_err is not None:
        raise vocab_err
    if final_postings != manifest_postings:
        raise RuntimeError(
            f"index integrity violation: postings dir holds {final_postings} "
            f"postings but manifests claim {manifest_postings}"
        )

    meta = {
        "codec_version": CODEC_VERSION,
        "block": BLOCK,
        "k1": k1,
        "b": b,
        "min_token_length": min_token_length,
        "shard_size": shard_size,
        "salt_chunk": salt_chunk,
        # doc_int // (shard_size * shards_per_part) == bpart by
        # construction (staging assigns dense ids in part order) — the
        # query side derives docmap PARTITION filters from winner ids
        "shards_per_part": (
            _spp(index_dir)
            if os.path.exists(f"{index_dir}/staged.json") else None
        ),
        "n_docs": n_docs,
        "total_terms": total_terms,
        "avgdl": avgdl,
        # count the WRITTEN vocabulary (parquet row-count metadata, no
        # scan) instead of vocab.count(), which re-ran the whole merge
        # aggregation — at a 200k-term vocabulary that recompute was
        # most of the finalize phase (r8)
        "n_vocab_terms": int(
            spark.read.parquet(f"{index_dir}/vocabulary").count()
        ),
        "posting_rows": sum(pm.get("posting_rows", 0) for pm in parts),
        "n_postings": sum(pm.get("n_postings", 0) for pm in parts),
        "compressed_payload_bytes": sum(
            pm.get("compressed_payload_bytes", 0) for pm in parts
        ),
        "n_parts": len(parts),
        "shuffle_write_bytes": sum(
            pm.get("shuffle_write_bytes") or 0 for pm in parts
        ),
        "shuffle_read_bytes": sum(
            pm.get("shuffle_read_bytes") or 0 for pm in parts
        ),
        "build_seconds": round(total_secs, 3),
        "docs_per_sec": round(n_docs / total_secs, 2) if total_secs > 0 else None,
        "tokens_per_sec": round(total_terms / total_secs, 2)
        if total_secs > 0
        else None,
    }
    os.makedirs(f"{index_dir}/stats", exist_ok=True)
    tmp = f"{index_dir}/stats/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, f"{index_dir}/stats/meta.json")
    return meta


def build_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_size: int = 100_000,
    salt_chunk: int = 200_000,
    shards_per_part: int = 8,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    min_token_length: int = MIN_TOKEN_LENGTH_DEFAULT,
    stop_words: Iterable[str] | None = None,
    id_assign_partitions: int | None = None,
    fail_after_parts: int | None = None,
) -> dict:
    """Checkpoint-resumable index build. Re-running after a crash skips
    bparts whose manifest rows are ``done`` (``fail_after_parts`` exists
    for the resume tests: raise after N parts to simulate a crash)."""
    spark = docs.sparkSession
    t_stage0 = time.time()
    smeta = _stage(docs, index_dir, id_col, text_col, shard_size,
                   shards_per_part, id_assign_partitions)
    stage_seconds = round(time.time() - t_stage0, 3)
    _SPP_CACHE[index_dir] = shards_per_part

    pending = [
        p for p in smeta["parts"]
        if not (
            (row := _read_manifest(index_dir, p)) and row.get("status") == "done"
        )
    ]
    if fail_after_parts is not None:
        # sequential mode with deterministic crash injection (tests)
        built = 0
        for p in pending:
            metrics = _build_one_part(
                spark, index_dir, p, shard_size, salt_chunk,
                min_token_length, stop_words,
            )
            _write_manifest(index_dir, p, metrics)
            built += 1
            if built >= fail_after_parts:
                raise RuntimeError(f"injected failure after {built} parts")
    elif pending:
        # concurrent part builds: disjoint output roots, independent
        # manifests; Spark schedules the jobs across the same executors
        from concurrent.futures import ThreadPoolExecutor

        def run(p: int) -> None:
            metrics = _build_one_part(
                spark, index_dir, p, shard_size, salt_chunk,
                min_token_length, stop_words,
            )
            _write_manifest(index_dir, p, metrics)

        with ThreadPoolExecutor(max_workers=min(4, len(pending))) as ex:
            list(ex.map(run, pending))

    t_parts1 = time.time()
    meta = finalize_index(
        spark, index_dir, k1, b, min_token_length, shard_size, salt_chunk
    )
    # phase decomposition for the bench report: staging (the single
    # corpus materialization + id freeze), the concurrent part builds
    # (wall clock, not CPU-sum — parts overlap), and finalize
    meta["phase_seconds"] = {
        "stage": stage_seconds,
        "parts_wall": round(t_parts1 - t_stage0 - stage_seconds, 3),
        "finalize": round(time.time() - t_parts1, 3),
    }
    return meta


def load_meta(index_dir: str) -> dict:
    with open(f"{index_dir}/stats/meta.json") as fh:
        return json.load(fh)


def append_docs(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental append (reference change-detector analog I6, done the
    Iceberg-snapshot way: new data claims FRESH id ranges → fresh build
    partitions; existing shards are never touched; global stats are
    re-derived from per-partition partials at finalize).

    New keys must not collide with existing ones (caller contract —
    dedupe/upsert is a MERGE on the staged table upstream). New ids
    start at the next part boundary so no existing part is rewritten.
    """
    spark = new_docs.sparkSession
    smeta = _staged_meta(index_dir)
    meta = load_meta(index_dir)
    shard_size = smeta["shard_size"]
    spp = smeta["shards_per_part"]
    part_docs = shard_size * spp
    start_part = (max(smeta["parts"]) + 1) if smeta["parts"] else 0
    start_id = start_part * part_docs
    gen = len(smeta["gens"])

    keyed = new_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    n_new, new_parts, offsets = _stage_docs(
        keyed, index_dir, part_docs,
        spark.sparkContext.defaultParallelism, start_id, gen,
    )
    if n_new:
        smeta["gens"].append(
            {"gen": gen, "base": start_id, "n": int(n_new),
             "offsets": {str(k): int(v) for k, v in offsets.items()}}
        )
    smeta["n_docs"] = smeta["n_docs"] + int(n_new)
    smeta["parts"] = sorted(set(smeta["parts"]) | set(new_parts))
    tmp = f"{index_dir}/staged.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(smeta, fh)
    os.replace(tmp, f"{index_dir}/staged.json")
    _SPP_CACHE[index_dir] = spp

    for p in new_parts:
        metrics = _build_one_part(
            spark, index_dir, int(p), shard_size, meta["salt_chunk"],
            meta["min_token_length"], None,
        )
        _write_manifest(index_dir, int(p), metrics)
    return finalize_index(
        spark, index_dir, meta["k1"], meta["b"], meta["min_token_length"],
        shard_size, meta["salt_chunk"],
    )


def sync_docs(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_missing: bool = True,
    compact: bool = True,
) -> dict:
    """Automatic change detection + incremental sync — the reference's
    change_detector.py:64-105 ("hash" strategy) as ONE operator:

    diff incoming (doc_id, content-hash) against the docmap's stored
    fp column (full-outer join, one shuffle, no text re-read) →
    - NEW keys            → append
    - MODIFIED (fp diff)  → tombstone the old doc_int + append anew
    - DELETED (absent)    → tombstone (``delete_missing=False`` keeps
      them — the "incoming is a partial feed" mode)

    Only the CHANGED key set is collected (churn-bounded, not corpus-
    bounded). ``compact=True`` (the default) rewrites the affected
    parts so df/N/avgdl are exact after the sync; ``compact=False``
    defers that (tombstoned docs vanish from results immediately but
    stats stay stale per the delete_docs contract — on heavy churn a
    term's stale df can exceed the post-append N, which the query path
    rejects with an explicit "run compact_index" error rather than
    serving broken scores). Returns
    {"new": n, "modified": n, "deleted": n, "meta": meta}.
    """
    spark = docs.sparkSession
    incoming = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    from ..functions.text import collapse_whitespace

    inc = incoming.select(
        "doc_id", F.md5(collapse_whitespace(F.col("text"))).alias("fp_new")
    )
    docmap = spark.read.parquet(f"{index_dir}/docmap")
    if "fp" not in docmap.columns:
        raise ValueError(
            "docmap has no fp column — index predates change detection; "
            "rebuild or append-only"
        )
    tomb = load_tombstones(index_dir)
    if tomb:
        docmap = docmap.filter(
            ~F.col("doc_int").isin([int(x) for x in tomb])
        )
    existing = docmap.select("doc_id", F.col("fp").alias("fp_old"))
    diff = inc.join(existing, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("fp_old").isNull(), "new")
        .when(F.col("fp_new").isNull(), "deleted")
        .when(F.col("fp_new") != F.col("fp_old"), "modified")
        .otherwise("unchanged")
        .alias("change"),
    )
    changed = diff.filter(F.col("change") != "unchanged").collect()
    new_keys = [r["doc_id"] for r in changed if r["change"] == "new"]
    mod_keys = [r["doc_id"] for r in changed if r["change"] == "modified"]
    del_keys = [r["doc_id"] for r in changed if r["change"] == "deleted"]
    if not delete_missing:
        del_keys = []

    if mod_keys or del_keys:
        delete_docs(spark, index_dir, mod_keys + del_keys)
    meta = None
    if new_keys or mod_keys:
        to_add = incoming.join(
            spark.createDataFrame(
                [(k,) for k in new_keys + mod_keys], "doc_id string"
            ),
            "doc_id",
            "left_semi",
        )
        meta = append_docs(to_add, index_dir)
    if compact:
        meta = compact_index(spark, index_dir)
    if meta is None:
        # delete-only sync without compaction follows the delete_docs
        # contract exactly: tombstoned docs vanish from results NOW,
        # stats (N/avgdl/df) stay pre-delete until compact_index — a
        # partial finalize here would shrink N under stale df (df > N
        # breaks the ln-IDF domain) and desync every surviving score.
        meta = load_meta(index_dir)
    return {
        "new": len(new_keys),
        "modified": len(mod_keys),
        "deleted": len(del_keys),
        "meta": meta,
    }


# ---------------------------------------------------------------------------
# Deletion (reference I4/I5 analog) — tombstones + compaction
# ---------------------------------------------------------------------------

def load_tombstones(index_dir: str) -> set[int]:
    path = f"{index_dir}/tombstones/doc_ints.json"
    try:
        with open(path) as fh:
            return set(json.load(fh))
    except FileNotFoundError:
        return set()


def delete_docs(spark: SparkSession, index_dir: str, doc_keys: list) -> dict:
    """Mark docs deleted (by original key). Scorers mask tombstoned ids
    at decode; ``finalize_index`` recomputes N/avgdl without them; df
    stays stale until ``compact_index`` rewrites the affected parts
    (the reference rewrites posting lists eagerly —
    inverted_index_builder.py:70-92 — which at 10^12 docs is exactly
    what we must NOT do per deletion)."""
    docmap = spark.read.parquet(f"{index_dir}/docmap")
    ints = [
        r["doc_int"]
        for r in docmap.filter(F.col("doc_id").isin(doc_keys)).collect()
    ]
    tomb = load_tombstones(index_dir) | set(int(x) for x in ints)
    os.makedirs(f"{index_dir}/tombstones", exist_ok=True)
    tmp = f"{index_dir}/tombstones/doc_ints.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(sorted(tomb), fh)
    os.replace(tmp, f"{index_dir}/tombstones/doc_ints.json")
    # Stats (N/avgdl/df) intentionally stay pre-delete until compaction:
    # tombstoned docs vanish from results immediately; surviving docs'
    # scores are unchanged until compact_index() recomputes everything.
    return load_meta(index_dir)


def compact_index(spark: SparkSession, index_dir: str) -> dict:
    """Rewrite the staged slices containing tombstoned docs: survivors
    keep their (pid, rn) — and therefore their doc_int — untouched;
    postings/vocab/docmap for the affected parts are rebuilt, index
    re-finalized, tombstones cleared LAST. Equivalent to the
    reference's remove_from_index + stats removal (I4/I5), done
    partition-locally.

    Crash-safe and idempotent: the tombstone file survives until the
    final step, so a crash anywhere mid-compact leaves every search
    still masking the deleted docs (the staged rewrite preserves
    survivor (pid, rn) — re-running compact re-applies a no-op filter,
    rebuilds the affected parts, and only then clears the mask). The
    two-step slice swap's crash window (rmtree done, rename not) is
    rolled FORWARD on entry: all replacement slices are fully written
    before any swap starts, so an orphaned ``staged_tmp`` slice with
    no live sibling is always complete."""
    import bisect
    import shutil

    tomb = load_tombstones(index_dir)
    meta = load_meta(index_dir)
    if not tomb:
        return meta
    smeta = _staged_meta(index_dir)
    part_docs = smeta["shard_size"] * smeta["shards_per_part"]
    affected = sorted({int(d) // part_docs for d in tomb})

    # map each tombstoned doc_int to its (gen, pid, rn)
    removals: dict[tuple[int, int], list[int]] = {}
    for g in smeta["gens"]:
        offs = sorted((int(v), int(k)) for k, v in g["offsets"].items())
        if not offs:
            continue
        starts = [v for v, _ in offs]
        for d in sorted(int(x) for x in tomb):
            if g["base"] <= d < g["base"] + g["n"]:
                i = bisect.bisect_right(starts, d) - 1
                off, pid = offs[i]
                removals.setdefault((int(g["gen"]), pid), []).append(d - off)

    # entry recovery: a prior compact that crashed between
    # rmtree(live) and rename(tmp, live) left the slice orphaned in
    # staged_tmp — roll it forward (it is complete by construction:
    # every tmp is written before any swap begins)
    for (gen, pid) in removals:
        src = f"{index_dir}/staged/gen={gen}/pid={pid}"
        tmp = f"{index_dir}/staged_tmp/gen={gen}/pid={pid}"
        if not os.path.isdir(src) and os.path.isdir(tmp):
            os.rename(tmp, src)

    for (gen, pid), rns in removals.items():
        src = f"{index_dir}/staged/gen={gen}/pid={pid}"
        tmp = f"{index_dir}/staged_tmp/gen={gen}/pid={pid}"
        spark.read.parquet(src).filter(~F.col("rn").isin(rns)) \
            .write.mode("overwrite").parquet(tmp)
    for (gen, pid) in removals:
        src = f"{index_dir}/staged/gen={gen}/pid={pid}"
        shutil.rmtree(src, ignore_errors=True)
        os.rename(f"{index_dir}/staged_tmp/gen={gen}/pid={pid}", src)
    shutil.rmtree(f"{index_dir}/staged_tmp", ignore_errors=True)
    for p in affected:
        _write_manifest(index_dir, p, {"bpart": p, "status": "stale"})

    # rebuild stale parts
    for p in affected:
        metrics = _build_one_part(
            spark, index_dir, p, meta["shard_size"], meta["salt_chunk"],
            meta["min_token_length"], None,
        )
        _write_manifest(index_dir, p, metrics)
    out = finalize_index(
        spark, index_dir, meta["k1"], meta["b"], meta["min_token_length"],
        meta["shard_size"], meta["salt_chunk"],
    )
    # clear the mask ONLY after the rebuilt parts are live and
    # finalized — the rebuilt docmap no longer contains these ids, so
    # finalize's tombstone filter above was a no-op, and a crash
    # before this line merely masks ids that no longer exist
    os.remove(f"{index_dir}/tombstones/doc_ints.json")
    return out
