"""spark-submit job: build / append / search a persisted IVF ANN index.

    # build (train k-means on a sample, assign, persist by list_id)
    spark-submit --master local[32] oboyu_spark/jobs/ann_index.py build \
        --embeddings /path/to/embeddings.parquet --index /path/to/ivf \
        [--n-lists 64] [--sample 100000] [--seeded] [--quantize]

    # incremental add against the frozen centroids
    spark-submit ... ann_index.py append \
        --embeddings /new/vectors.parquet --index /path/to/ivf

    # search (probed-partition scan only)
    spark-submit ... ann_index.py search \
        --index /path/to/ivf --query-json '[0.1, -0.2, ...]' \
        [--k 10] [--nprobe 8]

    # tombstone vectors (masked from search immediately), then
    # rewrite the lists without them and clear the tombstones
    spark-submit ... ann_index.py delete \
        --index /path/to/ivf --vec-ids-json '[12, 99]'
    spark-submit ... ann_index.py compact --index /path/to/ivf

Completes the deployment surface for the ANN family (the mirror of
build_index/query_index/sync_index for the BM25 side): the FAISS
train-once / assign-distributed / search-pruned lifecycle re-expressed
as a partitioned parquet layout (similarity.ivf_build/ivf_append/
ivf_search). ``--seeded`` uses the data-independent integer centroids
(``--quantize`` then enables the exact-integer assignment arithmetic —
the combination the driver oracle validates); default is the
k-means-trained quality path.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action",
                    choices=["build", "append", "search", "delete",
                             "compact"])
    ap.add_argument("--index", required=True)
    ap.add_argument("--embeddings",
                    help="parquet path or table:<name> (build/append)")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-lists", type=int, default=64)
    ap.add_argument("--sample", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--seeded", action="store_true",
                    help="data-independent seeded integer centroids "
                         "instead of k-means training")
    ap.add_argument("--quantize", action="store_true",
                    help="exact-integer assignment (requires --seeded)")
    ap.add_argument("--query-json", help="JSON float array (search)")
    ap.add_argument("--vec-ids-json",
                    help="JSON array of vec_ids to tombstone (delete)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from oboyu_spark.operators import similarity as S

    spark = SparkSession.builder.appName("oboyu_spark.ann_index").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.action in ("build", "append") and not args.embeddings:
        ap.error(f"{args.action} needs --embeddings")

    if args.action == "build":
        from oboyu_spark.sources.io import read_input

        emb = read_input(spark, args.embeddings)
        centroids = None
        if args.seeded:
            dim = len(emb.select(args.vec_col).first()[0])
            centroids = S.ivf_seeded_centroids(dim, n_lists=args.n_lists,
                                               seed=args.seed)
        elif args.quantize:
            ap.error("--quantize needs --seeded (integer-space centroids)")
        cent = S.ivf_build(
            emb, args.index, n_lists=args.n_lists, sample=args.sample,
            iters=args.iters, seed=args.seed, centroids=centroids,
            id_col=args.id_col, vec_col=args.vec_col,
            quantize=args.quantize,
        )
        print(json.dumps({
            "action": "build", "index": args.index,
            "n_lists": int(cent.shape[0]), "dim": int(cent.shape[1]),
            "quantize": bool(args.quantize),
            "n_vectors": emb.count(),
        }))
    elif args.action == "append":
        from oboyu_spark.sources.io import read_input

        emb = read_input(spark, args.embeddings)
        S.ivf_append(emb, args.index, id_col=args.id_col,
                     vec_col=args.vec_col)
        print(json.dumps({
            "action": "append", "index": args.index,
            "n_added": emb.count(),
        }))
    elif args.action == "delete":
        if not args.vec_ids_json:
            ap.error("delete needs --vec-ids-json")
        ids = json.loads(args.vec_ids_json)
        S.ivf_delete(args.index, ids)
        print(json.dumps({
            "action": "delete", "index": args.index,
            "n_tombstones": len(S.ivf_load_tombstones(args.index)),
        }))
    elif args.action == "compact":
        S.ivf_compact(spark, args.index)
        print(json.dumps({
            "action": "compact", "index": args.index,
            "n_vectors": spark.read.parquet(f"{args.index}/lists").count(),
        }))
    else:
        if not args.query_json:
            ap.error("search needs --query-json")
        qvec = [float(x) for x in json.loads(args.query_json)]
        rows = S.ivf_search(spark, args.index, qvec, k=args.k,
                            nprobe=args.nprobe).collect()
        print(json.dumps({
            "action": "search", "k": args.k, "nprobe": args.nprobe,
            "results": [
                {"vec_id": r["vec_id"].item()
                 if hasattr(r["vec_id"], "item") else r["vec_id"],
                 "cosine": float(r["cosine"])}
                for r in rows
            ],
        }))


if __name__ == "__main__":
    main()
