"""One-off measurement for picking the literal bounds in the upgraded
invariant-oracled tail queries (round 5): LSH pair recall, IVF recall@10,
MinHash estimate error over exact pairs, SimHash hamming over exact pairs,
LSH bucket histogram shape. Run at all three SFs; pick bounds with margin.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.session import get_spark


def main() -> None:
    spark = get_spark(parallelism=8, shuffle_partitions=8)
    from crawler_spark.operators.dedup import (
        minhash_signatures,
        ngram_jaccard_pairs_prefix,
        simhash_fingerprints,
    )
    from crawler_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        pairwise_cosine_near_dups,
        with_lsh_bucket,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        print(f"=== {sf} docs={d.count()} emb={emb.count()}")

        # exact embedding pairs >= 0.35 (capped like q_embed_near_pairs)
        from crawler_spark.operators.similarity import cosine

        e = emb.filter(F.col("vec_id") < 4096)
        a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
        b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
        exact = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("s"))
            .filter(F.col("s") >= 0.35)
        )
        lsh = pairwise_cosine_near_dups(emb, threshold=0.35, n_planes=8, n_tables=8)
        n_exact = exact.count()
        n_lsh = lsh.count()
        n_common = lsh.join(exact, ["id_a", "id_b"], "left_semi").count()
        print(f"  embed: n_exact={n_exact} n_lsh={n_lsh} common={n_common} "
              f"subset_violations={n_lsh - n_common} recall={n_common / max(n_exact, 1):.3f}")

        # IVF recall@10 vs exact top-10
        q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        exact10 = {r["id"] for r in cosine_topk(emb, q, k=10).collect()}
        ivf = [r["id"] for r in ivf_ann_topk(emb, q, k=10, n_cells=16, n_probe=4).collect()]
        hit = len(set(ivf) & exact10)
        top1 = cosine_topk(emb, q, k=1).collect()[0]["id"]
        print(f"  ivf: n_ivf={len(ivf)} recall@10={hit}/10 top1_in_ivf={top1 in set(ivf)}")

        # exact n-gram pairs + minhash error + simhash hamming
        exact_pairs = ngram_jaccard_pairs_prefix(d, "doc_id", "text", n=3, threshold=0.5)
        sigs = minhash_signatures(d, "doc_id", "text", num_hashes=64, n=3)
        est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda q_: q_)) / F.lit(64)
        joined = (
            exact_pairs.join(sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a")), "id_a")
            .join(sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b")), "id_b")
            .select("id_a", "id_b", "jaccard", est.alias("est"))
            .withColumn("err", F.abs(F.col("est") - F.col("jaccard")))
        )
        stats = joined.agg(F.count("*").alias("n"), F.max("err").alias("max_err"),
                           F.expr("percentile(err, 0.99)").alias("p99")).collect()[0]
        print(f"  minhash: pairs={stats['n']} max_err={stats['max_err']} p99={stats['p99']}")

        fps = simhash_fingerprints(d, "doc_id", "text")
        ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
        hj = (
            exact_pairs.join(fps.select(F.col("id").alias("id_a"), F.col("simhash").alias("fa")), "id_a")
            .join(fps.select(F.col("id").alias("id_b"), F.col("simhash").alias("fb")), "id_b")
            .select(ham.alias("h"))
        )
        hs = hj.agg(F.count("*").alias("n"), F.max("h").alias("max_h"),
                    F.expr("percentile(h, 0.99)").alias("p99")).collect()[0]
        print(f"  simhash: pairs={hs['n']} max_hamming={hs['max_h']} p99={hs['p99']}")

        bk = with_lsh_bucket(emb, 8).groupBy("bucket").agg(F.count("*").alias("n"))
        bs = bk.agg(F.count("*").alias("nb"), F.max("n").alias("mx"), F.sum("n").alias("tot")).collect()[0]
        print(f"  lsh_buckets: n_buckets={bs['nb']} max_bucket={bs['mx']} total={bs['tot']}")

        # winnow bounds check (sanity only)
        from crawler_spark.operators.textstats import winnowing_fingerprints
        from crawler_spark.operators.dedup import tokens

        wf = winnowing_fingerprints(d, "doc_id", "text")
        norm_len = F.length(F.concat_ws(" ", tokens(F.col("text"))))
        nk = F.greatest(norm_len - F.lit(4), F.lit(0))
        meta = d.select(F.col("doc_id").alias("id"), nk.alias("n_kgrams"))
        chk = wf.join(meta, "id").select(
            "id", "n_kgrams", F.size("fingerprints").alias("n_fp"),
            F.when(F.col("n_kgrams") <= 0, F.col("n_fp") == 0)
            .otherwise(
                (F.col("n_fp") >= 1)
                & (F.col("n_fp") <= F.greatest(F.col("n_kgrams") - F.lit(3), F.lit(1)))
            ).alias("ok"),
        )
        bad = chk.filter(~F.col("ok")).count()
        print(f"  winnow: docs={chk.count()} bounds_violations={bad}")


if __name__ == "__main__":
    main()
