"""Deterministic reference-style query fixture set.

Mirrors the reference bench protocol (bench/config.py:40-55,
bench/speed/generate_queries.py:17-100): 50 Japanese + 50 English + 20
mixed queries, template-generated over the same vocabulary pool as the
synthetic transcripts so every query has matches. Seeded, no wall-clock.
"""

from __future__ import annotations

import random

from .transcripts import WORDS

EN_WORDS = [w for w in WORDS if w.isascii()]
JA_WORDS = [w for w in WORDS if not w.isascii()]


def generate_queries(seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    out: list[dict] = []

    def make(lang: str, pool: list[str], n: int):
        for i in range(n):
            n_terms = rng.randint(1, 4)
            text = " ".join(rng.choice(pool) for _ in range(n_terms))
            out.append(
                {"id": f"{lang}_{i:03d}", "lang": lang, "text": text}
            )

    make("ja", JA_WORDS, 50)
    make("en", EN_WORDS, 50)
    make("mixed", EN_WORDS + JA_WORDS, 20)
    return out
