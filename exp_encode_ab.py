"""Interleaved A/B: encode-stage partition count (r2 spp//4=4 vs spp=16).

Same JVM, warmup build first, then alternating A/B builds; report
per-phase seconds per run plus min/median per variant. Noise on this
box is +/-50-100% minute-to-minute, so only the interleaved min is
meaningful (see BENCH.md protocol).
"""
import json
import shutil
import statistics
import tempfile
import time

from oboyu_spark.operators import postings
from oboyu_spark.operators.postings import build_index
from oboyu_spark.session import get_spark
from oboyu_spark.sources.transcripts import synthesize_transcripts, turns_as_docs

spark = get_spark(app_name="encode_ab", cores="32")
tr = synthesize_transcripts(spark, n_convs=12000, max_turns=20, seed=42)
docs = turns_as_docs(tr).select("doc_id", "text").persist()
docs.count()


def one_build(enc):
    postings.ENCODE_PARTITIONS = enc
    idx = tempfile.mkdtemp(prefix="ab_idx_")
    t0 = time.time()
    meta = build_index(docs, idx, shard_size=10_000, salt_chunk=50_000,
                       shards_per_part=16)
    total = time.time() - t0
    shutil.rmtree(idx, ignore_errors=True)
    return total, meta["phase_seconds"]


one_build(None)  # warmup (JIT)
results = {"A_enc4": [], "B_encspp": []}
for rep in range(3):
    for name, enc in (("A_enc4", 4), ("B_encspp", None)):
        total, ph = one_build(enc)
        results[name].append({"total": round(total, 2), **ph})
        print(f"rep{rep} {name}: total={total:.2f} phases={ph}", flush=True)

for name, runs in results.items():
    tots = [r["total"] for r in runs]
    parts = [r["parts_wall"] for r in runs]
    print(json.dumps({
        "variant": name,
        "total_min": min(tots), "total_med": statistics.median(tots),
        "parts_min": min(parts), "parts_med": statistics.median(parts),
    }), flush=True)
spark.stop()
