"""Block-max WAND top-k scorer — the pruned document-at-a-time path.

Runs inside the same scatter-gather harness as the TAAT scorer
(searchidx.search_index(scorer="bmw")): per shard, per query, a classic
WAND pivot loop with block-level upper bounds:

- term upper bound   ub_t  = w_t · max_block(maxw)   (w_t = qtf·idf)
- block upper bound  bub_t = w_t · block_maxw[block(cursor)]
- pivot: smallest prefix of doc-sorted lists whose Σ ub ≥ θ
- at an aligned pivot, if Σ block-ubs < θ → skip to the next block
  boundary without decoding/scoring; else score the pivot doc exactly.

θ is the current k-th best true score (min-heap); pruning is strict
(UB < θ) and ties break (score desc, doc asc), so the result is
EXACTLY the unpruned top-k — pinned by tests against the TAAT scorer
and the oracle.

Negative-IDF handling (SURVEY §7(c)): WAND's upper-bound monotonicity
assumes non-negative term weights. The reference's ln-IDF goes negative
for df > N/2, so any query containing such a term falls back to exact
TAAT for that query (documented design: a disjunction with negative
weights is inherently un-prunable without score-shifting, which would
change the reference's scores). Queries whose terms are all positive —
the normal case for selective queries at scale — get full pruning.

Salt chunks of one term are concatenated (they are disjoint ascending
doc ranges by construction) so WAND sees one ordered stream per term.
"""

from __future__ import annotations

import heapq
from typing import Callable

import numpy as np
import pandas as pd


def _concat_term_chunks(chunks, block: int):
    """Merge salt chunks (disjoint ascending ranges) into one list."""
    ids = np.concatenate([c[0] for c in chunks])
    wtf = np.concatenate([c[1] for c in chunks])
    blast = np.concatenate([c[2] for c in chunks])
    bmaxw = np.concatenate([c[3] for c in chunks])
    return ids, wtf, blast, bmaxw


class _TermList:
    __slots__ = ("ids", "contrib", "blast", "bub", "ub", "cur", "n")

    def __init__(self, ids, wtf, blast, bmaxw, w):
        self.ids = ids
        self.contrib = w * wtf
        self.blast = blast
        self.bub = w * bmaxw
        self.ub = float(self.bub.max())
        self.cur = 0
        self.n = ids.size

    def doc(self):
        return self.ids[self.cur] if self.cur < self.n else np.iinfo(np.int64).max

    def advance_to(self, d):
        # galloping via searchsorted on the remaining suffix
        self.cur += int(np.searchsorted(self.ids[self.cur :], d, side="left"))

    def block_ub_at(self, d) -> float:
        bi = int(np.searchsorted(self.blast, d, side="left"))
        if bi >= self.bub.size:
            return 0.0
        return float(self.bub[bi])

    def block_end_at(self, d) -> int:
        bi = int(np.searchsorted(self.blast, d, side="left"))
        if bi >= self.blast.size:
            return np.iinfo(np.int64).max
        return int(self.blast[bi])


def _bmw_one(lists: list[_TermList], k: int):
    """Exact top-k (score desc, doc asc) via block-max WAND."""
    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap
    INF = np.iinfo(np.int64).max

    def theta():
        return heap[0][0] if len(heap) == k else -np.inf

    while True:
        live = [t for t in lists if t.cur < t.n]
        if not live:
            break
        live.sort(key=lambda t: t.doc())
        # find pivot: smallest prefix whose Σ ub ≥ θ (inclusive, so
        # potential score==θ ties are still evaluated; pruning strict <)
        th = theta()
        cum = 0.0
        pivot_i = -1
        for i, t in enumerate(live):
            cum += t.ub
            if cum >= th:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # total remaining UB < theta → nothing can enter
        pivot_doc = int(live[pivot_i].doc())
        if pivot_doc == INF:
            break
        # extend the pivot prefix over every list already AT pivot_doc —
        # their weights belong to the pivot doc's upper bound too
        while pivot_i + 1 < len(live) and int(live[pivot_i + 1].doc()) == pivot_doc:
            pivot_i += 1
        if int(live[0].doc()) == pivot_doc:
            # aligned: block-max check over the prefix
            bub = 0.0
            for t in live[: pivot_i + 1]:
                bub += t.block_ub_at(pivot_doc)
            if len(heap) == k and bub < theta():
                # Skip to just past the nearest prefix block end — but no
                # further than the first suffix list's current doc: docs
                # in the skipped range may appear in suffix lists, and
                # their UB would then include suffix weights (Ding&Suel
                # BMW next-doc rule).
                nxt = min(t.block_end_at(pivot_doc) for t in live[: pivot_i + 1])
                target = min(nxt + 1, INF)  # avoid int64 overflow at tail
                if pivot_i + 1 < len(live):
                    target = min(target, int(live[pivot_i + 1].doc()))
                target = max(target, pivot_doc + 1)  # guarantee progress
                for t in live[: pivot_i + 1]:
                    t.advance_to(target)
                continue
            # score pivot doc exactly across ALL lists
            s = 0.0
            for t in lists:
                if t.cur < t.n:
                    t.advance_to(pivot_doc)
                    if t.cur < t.n and t.ids[t.cur] == pivot_doc:
                        s += float(t.contrib[t.cur])
            entry = (s, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for t in live:
                if t.cur < t.n and t.ids[t.cur] == pivot_doc:
                    t.cur += 1
        else:
            # advance the leading lists up to the pivot doc
            for t in live[:pivot_i]:
                t.advance_to(pivot_doc)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


def make_bmw_scorer(
    qmap: dict[int, list[tuple[str, int]]],
    idf_map: dict[str, float],
    k1: float,
    b: float,
    avgdl: float,
    k: int,
    shard_size: int,
    tomb: np.ndarray | None = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    from .codec import decode_varbyte
    from .postings import wtf_upper
    from .searchidx import _decode_rows, _wtf

    def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        base = shard * shard_size
        # block upper bounds from stats-drift-robust (maxtf, mindl)
        # metadata, evaluated with the CURRENT k1/b/avgdl
        blasts: dict[tuple[int, int], list] = {}
        for r in pdf.sort_values(["th1", "th2", "salt"]).itertuples():
            blasts.setdefault((int(r.th1), int(r.th2)), []).append(
                (
                    np.asarray(r.block_last, dtype=np.int64) - base,
                    wtf_upper(r.block_maxtf, r.block_mindl, k1, b, avgdl),
                )
            )
        pdf = pdf.assign(
            wtf=[
                _wtf(decode_varbyte(t), decode_varbyte(d), k1, b, avgdl)
                for t, d in zip(pdf["tfs"], pdf["dls"])
            ]
        )
        decoded = _decode_rows(pdf, base, tomb)

        rows_q: list[int] = []
        rows_d: list[int] = []
        rows_s: list[float] = []
        acc = np.zeros(shard_size, dtype=np.float64)
        touched = np.zeros(shard_size, dtype=bool)
        for qid, qterms in qmap.items():
            weights = [
                (t, qtf, idf_map[t])
                for t, qtf in qterms
                if t in idf_map and t in decoded
            ]
            if not weights:
                continue
            if any(qtf * idf <= 0 for _, qtf, idf in weights):
                # exact fallback: dense TAAT for this query
                acc[:] = 0.0
                touched[:] = False
                for t, qtf, idf in weights:
                    w = qtf * idf
                    for ids, wtf in decoded[t]:
                        acc[ids] += w * wtf
                        touched[ids] = True
                cand = np.flatnonzero(touched)
                s = acc[cand]
                order = np.lexsort((cand, -s))[:k]
                for i in order:
                    rows_q.append(qid)
                    rows_d.append(int(cand[i]) + base)
                    rows_s.append(float(s[i]))
                continue
            lists = []
            for t, qtf, idf in weights:
                chunks = [
                    (ids, wtf, bl, bm)
                    for (ids, wtf), (bl, bm) in zip(decoded[t], blasts[t])
                ]
                ids, wtf, bl, bm = _concat_term_chunks(chunks, 128)
                lists.append(_TermList(ids, wtf, bl, bm, qtf * idf))
            for d, s in _bmw_one(lists, k):
                rows_q.append(qid)
                rows_d.append(int(d) + base)
                rows_s.append(float(s))
        return pd.DataFrame(
            {
                "query_id": pd.Series(rows_q, dtype="int32"),
                "doc_int": pd.Series(rows_d, dtype="int64"),
                "score": pd.Series(rows_s, dtype="float64"),
            }
        )

    return score_shard
