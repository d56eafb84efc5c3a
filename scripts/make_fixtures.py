"""Generate the committed parquet fixtures under fixtures/.

These make the approximate / engine-defined registry queries ORACLE-GATED
(CORRECTNESS) instead of rows-only:

- ann_corpus.parquet   — the sf0.01 embeddings corpus, copied verbatim so
                         knn_recall_eval is scale-factor-independent;
- ann_approx.parquet   — the engine's OWN persisted LSH and IVF top-k
                         output over that corpus (method, vec_id, rank,
                         neighbor_id); the recall gate compares it against
                         an exact top-k that BOTH Spark and DuckDB
                         recompute independently;
- simhash_sigs.parquet — the engine's simhash signatures over the sf0.01
                         documents corpus + injected exact copies; the
                         DuckDB oracle extracts near-dup pairs all-pairs
                         from it, which the banded Spark path must match
                         exactly (recall proof for the banding);
- media.parquet        — the deterministic synthetic media corpus
                         (binary payloads + typed metadata) so multimodal
                         aggregates are DuckDB-recomputable.

Run from the repo root: python scripts/make_fixtures.py
Deterministic: re-running produces byte-equivalent logical content (file
bytes may differ by parquet writer metadata; values never do).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from pasar_spark.functions.multimodal import synth_media
from pasar_spark.functions.similarity import ivf_cells, ivf_topk, lsh_topk
from pasar_spark.functions.text import simhash, winnow_fingerprints
from pasar_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def write(df, name):
    path = os.path.join(OUT, name)
    shutil.rmtree(path, ignore_errors=True)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    # drop the _SUCCESS marker etc. noise out of git? keep: Spark layout
    print(f"wrote {path}: {df.count()} rows")


def main():
    # optional argv: fixture-group names to regenerate (ann, ivf, simhash,
    # winnow, media); default all — selective reruns avoid churning the
    # parquet bytes of fixtures whose generator did not change
    only = set(sys.argv[1:])

    def want(group: str) -> bool:
        return not only or group in only

    spark = get_spark("make-fixtures", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    if want("ann"):
        corpus = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        write(corpus, "ann_corpus.parquet")
    corpus = spark.read.parquet(os.path.join(OUT, "ann_corpus.parquet"))

    if want("ann"):
        # parameters chosen to clear the recall@3 >= 0.9 floor on this corpus
        # (near-orthogonal random vectors — the HARD case for ANN; measured:
        # lsh 4 planes x 16 tables -> 0.916, ivf 8 cells x 6 probes -> 0.927)
        lsh = lsh_topk(corpus, k=3, n_planes=4, n_tables=16).select(
            F.lit("lsh").alias("method"), "vec_id", "rank", "neighbor_id"
        )
        ivf = ivf_topk(corpus, k=3, n_cells=8, n_probe=6).select(
            F.lit("ivf").alias("method"), "vec_id", "rank", "neighbor_id"
        )
        write(lsh.unionByName(ivf), "ann_approx.parquet")

    if want("ivf"):
        # the IVF index state itself (assignment + probe lists) — the
        # knn_ivf_topk oracle recomputes candidate top-k over these cells
        # in DuckDB; parameters MUST match the registered query
        assigned, probes = ivf_cells(corpus, n_cells=8, n_probe=6)
        write(assigned, "ivf_cells.parquet")
        write(probes, "ivf_probes.parquet")

    if want("simhash") or want("winnow"):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        both = docs.unionByName(
            docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        )
        if want("simhash"):
            sigs = both.select("doc_id", simhash(F.col("text")).alias("sig"))
            write(sigs, "simhash_sigs.parquet")
        if want("winnow"):
            fps = both.select(
                "doc_id",
                F.explode(winnow_fingerprints(F.col("text"), 5, 4)).alias("fp"),
            )
            write(fps, "winnow_fps.parquet")

    if want("media"):
        write(synth_media(spark, 200), "media.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
