"""Pure-Python BM25 oracle — test scaffolding, NOT the engine.

An independent reimplementation of the reference's in-memory BM25
semantics (SURVEY §0.1 impl (1)):

- tokenize: FallbackTokenizer (tokenizer.py:263-302) via
  functions.text.py_tokenize (shared with query-side tokenization,
  mirroring the reference where docs and queries use the same tokenizer,
  tokenizer.py:374-376).
- stats: BM25StatisticsCalculator (bm25_statistics_calculator.py):
  document_count counts every doc incl. empty ones (line 77);
  df/cf/doc-length dictionaries.
- score: calculate_bm25_term_score (lines 151-187): ln-IDF without +1,
  k1=1.2, b=0.75; query terms iterated as a list (bm25_indexer.py:332).
- top-k: score DESC then doc_id ASC (tie-break we fix on both sides).

Used by tests to check the Spark engine's ranks and scores, and by the
golden-file generator for tokenizer fixtures.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from ..functions.text import py_term_frequencies, py_tokenize


class PyBM25:
    def __init__(
        self,
        k1: float = 1.2,
        b: float = 0.75,
        min_token_length: int = 2,
        stop_words: Iterable[str] | None = None,
    ) -> None:
        self.k1 = k1
        self.b = b
        self.min_token_length = min_token_length
        self.stop_words = set(stop_words) if stop_words else None
        self.doc_tfs: dict[object, dict[str, int]] = {}
        self.doc_lengths: dict[object, int] = {}
        self.document_frequencies: dict[str, int] = {}
        self.collection_frequencies: dict[str, int] = {}
        self.document_count = 0
        self.total_document_length = 0

    # -- build ----------------------------------------------------------
    def index(self, docs: Sequence[tuple[object, str]]) -> None:
        for doc_id, text in docs:
            tf = py_term_frequencies(
                text,
                min_token_length=self.min_token_length,
                stop_words=self.stop_words,
            )
            self.doc_tfs[doc_id] = tf
            dl = sum(tf.values())
            self.doc_lengths[doc_id] = dl
            self.total_document_length += dl
            self.document_count += 1
            for term in tf:
                self.document_frequencies[term] = (
                    self.document_frequencies.get(term, 0) + 1
                )
            for term, c in tf.items():
                self.collection_frequencies[term] = (
                    self.collection_frequencies.get(term, 0) + c
                )

    # -- stats ----------------------------------------------------------
    @property
    def avgdl(self) -> float:
        if self.document_count == 0:
            return 0.0
        return self.total_document_length / self.document_count

    def idf(self, term: str) -> float:
        df = self.document_frequencies.get(term, 0)
        if df == 0:
            return 0.0
        return math.log((self.document_count - df + 0.5) / (df + 0.5))

    # -- scoring --------------------------------------------------------
    def score(self, query_terms: Sequence[str], doc_id: object) -> float:
        dl = self.doc_lengths.get(doc_id, 0)
        if dl == 0:
            return 0.0
        tfs = self.doc_tfs.get(doc_id, {})
        s = 0.0
        for term in query_terms:  # list semantics: dups count twice
            tf = tfs.get(term)
            if not tf:
                continue
            df = self.document_frequencies.get(term, 0)
            if df == 0:
                continue
            idf = math.log((self.document_count - df + 0.5) / (df + 0.5))
            num = tf * (self.k1 + 1.0)
            den = tf + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
            s += idf * (num / den)
        return s

    def search(self, query: str, k: int = 10,
               mode: str = "or") -> list[tuple[object, float]]:
        terms = py_tokenize(
            query,
            min_token_length=self.min_token_length,
            stop_words=self.stop_words,
        )
        # mode="or": matched docs = docs sharing >=1 query term — ranked
        # even when the summed score is 0 or negative (SQL-spec
        # semantics: consolidated_queries.py:399-402 ranks every matched
        # chunk). mode="and": posting-list intersection — every distinct
        # query term must occur in the doc.
        tset = set(terms)
        scored = []
        for doc_id, tfs in self.doc_tfs.items():
            if mode == "and":
                if not tset or not tset.issubset(tfs):
                    continue
            elif tset.isdisjoint(tfs):
                continue
            scored.append((doc_id, self.score(terms, doc_id)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
