"""Per-branch wall-clock profile of q_llm_curation_suite (guide §1: measure
first). Times each tagged branch's own noop-sink write in isolation, twice
(cold + warm), releasing staged caches between branches so each branch pays
its own staging. Prints one JSON line.

Usage: python tools/profile_llm_suite.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tern_ep_data_pipeline_spark.operators import sampling, text, dedup
from tern_ep_data_pipeline_spark.operators.graph import dedup_clusters
from tern_ep_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_llm_suite")
    docs = entrymod._t(spark, sf_dir, "documents")

    def branches():
        pairs = dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", num_hashes=16, bands=4, threshold=0.2,
            hash_mode="portable",
        )
        cluster_frame = dedup._stage(dedup_clusters(pairs))
        yield "cc", cluster_frame
        yield "split", sampling.leak_free_split(docs, "doc_id", cluster_frame)
        bucket = sampling.hash_bucket(F.col("doc_id"), salt="smp")
        yield "sample", docs.withColumn("bucket", bucket).where(F.col("bucket") < 2000)
        injected = F.concat(
            F.lit("contact u"), F.col("doc_id").cast("string"),
            F.lit("@ex.com or call 555-123-4567 "), F.col("text"),
        )
        yield "pii", docs.select(
            F.md5(text.scrub_pii(injected)).alias("v"),
            text.pii_hits(injected).alias("h"),
        )
        yield "budget", sampling.budget_select(
            docs, "source", [F.col("n_chars").desc(), F.col("doc_id")], "n_chars", 2000
        )
        yield "tfidf", text.tfidf_top_terms(docs, "doc_id", "text", k=3)
        yield "rep", text.repetition_stats(docs, "doc_id", "text")
        yield "decon", text.contamination_hits(
            docs.where(F.col("doc_id") % 97 != 0),
            docs.where(F.col("doc_id") % 97 == 0),
            "doc_id", "text", n=8,
        )
        yield "mix", sampling.temperature_sample(
            docs, "doc_id", "source", alpha=0.5, total=2000, salt="mix"
        )
        yield "pack", sampling.pack_sequences(
            docs, "doc_id", "n_chars", seq_len=4096, group_cols=("source",)
        )
        yield "seqs", sampling.materialise_sequences(
            docs, "doc_id", "text", "n_chars", seq_len=4096, group_cols=("source",)
        )
        yield "dsir", sampling.importance_resample(
            docs, docs.where(F.col("lang") == "en"), 100, buckets=10_000,
            target_subset_of_raw=True,
        )
        yield "dsir_ext", sampling.importance_resample(
            docs.where(F.col("doc_id") % 2 == 0),
            docs.where((F.col("doc_id") % 2 == 1) & (F.col("lang") == "en")),
            100, buckets=10_000,
        )

    out: dict[str, list[float]] = {}
    # two passes: pass 0 cold (each branch pays its staging), pass 1 repeats
    for run in range(2):
        for name, df in branches():
            spark.sparkContext.setJobDescription(f"llm-suite:{name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
        dedup.release_staged(spark)
    # and the whole fused query, as the bench runs it
    t0 = time.time()
    n = entrymod.q_llm_curation_suite(spark, sf_dir).count()
    whole = round(time.time() - t0, 3)
    dedup.release_staged(spark)
    t0 = time.time()
    n = entrymod.q_llm_curation_suite(spark, sf_dir).count()
    whole2 = round(time.time() - t0, 3)
    print(json.dumps({"branches": out, "whole": [whole, whole2], "rows": n}))
    spark.stop()


if __name__ == "__main__":
    main()
