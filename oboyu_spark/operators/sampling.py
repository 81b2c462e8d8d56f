"""Deterministic, shuffle-free corpus sampling for training-data runs.

`df.sample()` is seed-stable only for a FIXED partitioning — repartition
the corpus (or run on a different cluster size) and the sampled set
changes, which poisons reproducibility of any downstream training run.
The operators here gate each row on a hash of its OWN id instead:
membership is a pure function of (doc_id, salt, seed, fraction),
identical on any partitioning, any cluster size, any row order — and
monotone in ``fraction`` (a 1% sample is a subset of the 10% sample at
the same seed+salt, the property that makes growing a training mix
reproducible). Each operator salts its gate, so distinct operators at
the same seed compose independently (multiplicative thinning) rather
than being secretly correlated.

Scale shape: a stateless column predicate, fused into the scan by
Catalyst — zero shuffle, zero collect, no count pass. ``hash_mode=
"md5"`` keeps the gate bit-reproducible in DuckDB (oracle parity, the
repo-wide pattern); ``"xxh64"`` is the cheaper JVM hash for production
runs where an external oracle isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GATE_SPACE = 1_000_000  # hash buckets the fraction is quantized over


def _gate(col: Column, seed: int, hash_mode: str, salt: str) -> Column:
    """Uniform pseudo-random integer in [0, GATE_SPACE) derived from
    the id value + per-operator salt + seed. The salt decorrelates the
    gates of DIFFERENT operators at the same seed (ADVICE r5 #4:
    without it, a 10% ``deterministic_sample`` followed by a
    ``stratified_sample`` cut ≥ 0.1 kept 100% of the survivors —
    composition was fully correlated); gates of the SAME operator stay
    correlated on purpose, which is what makes fraction monotone."""
    tagged = F.concat(col.cast("string"), F.lit(f"#{salt}#{seed}"))
    if hash_mode == "md5":
        # same md5→integer path the dedup family uses: exact twin in
        # DuckDB via ('0x' || substr(md5(...), 1, 8))::UBIGINT
        h = F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")
    elif hash_mode == "xxh64":
        h = F.abs(F.xxhash64(tagged))
    else:
        raise ValueError(f"hash_mode={hash_mode!r} not in ('md5', 'xxh64')")
    return F.pmod(h, F.lit(GATE_SPACE))


def deterministic_sample(
    docs: DataFrame,
    fraction: float,
    seed: int = 42,
    id_col: str = "doc_id",
    hash_mode: str = "md5",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff hash(id, salt, seed) mod 1e6 < fraction·1e6.

    Exact membership is reproducible forever from (seed, fraction);
    the realized rate converges to ``fraction`` by the uniformity of
    the hash (not exact-count sampling — an exact-k sample needs a
    global sort, which is the wrong plan at 100 TB). Two calls at the
    same (seed, salt) share one gate — fraction is MONOTONE (the 1%
    sample is a subset of the 10% one); calls with different salts
    (including ``stratified_sample``'s default) are independent, so
    composed sampling stages thin multiplicatively. Pass distinct
    salts (or seeds) for independent stages you'd otherwise run at the
    same seed."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction} outside [0, 1]")
    cut = int(round(fraction * GATE_SPACE))
    return docs.filter(_gate(F.col(id_col), seed, hash_mode, salt) < cut)


def stratified_sample(
    docs: DataFrame,
    fractions: "dict[str, float]",
    strata_col: str,
    default_fraction: float = 0.0,
    seed: int = 42,
    id_col: str = "doc_id",
    hash_mode: str = "md5",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix balancer
    (e.g. keep 100% of 'ja', 10% of 'en', drop the rest): each row's
    cut comes from its ``strata_col`` value, the gate from its id.
    Same zero-shuffle scan-fused shape; strata with no entry use
    ``default_fraction``. The default salt differs from
    ``deterministic_sample``'s, so chaining the two at one seed thins
    multiplicatively instead of being fully correlated (ADVICE r5
    #4); per-stratum fractions within ONE call stay monotone."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fractions[{k!r}]={f} outside [0, 1]")
    cut = F.lit(int(round(default_fraction * GATE_SPACE)))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == value,
                     F.lit(int(round(frac * GATE_SPACE)))).otherwise(cut)
    return docs.filter(_gate(F.col(id_col), seed, hash_mode, salt) < cut)
