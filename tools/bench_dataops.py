"""Scale bench for the round-4 data-pipeline operators on synthetic
corpora (deterministic, sized so each stage wall is seconds-scale on
local[32] — large enough to expose a quadratic blowup, small enough to
iterate).

Usage: python tools/bench_dataops.py [n_docs] [n_vecs]
Prints one JSON line per operator: wall seconds + input size + throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_docs(spark, n_docs: int):
    """Deterministic docs: ~60 words from a small vocab (guaranteeing
    n-gram repetition), every 10th doc shares a 20-word block (guaranteed
    cross-doc duplicate spans), newline every ~9 words."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"), "id"
    )
    word = (
        "concat('w', cast(pmod(hash(id, {j}), 500) as string))"
    )
    words = ", ".join(word.format(j=j) for j in range(60))
    shared = " ".join(f"s{i}" for i in range(20))
    return base.select(
        "doc_id",
        F.expr(
            f"concat_ws(' ', {words})"
        ).alias("_w"),
    ).select(
        "doc_id",
        F.when(
            F.expr("cast(substring(doc_id, 2) as bigint) % 10 = 0"),
            F.concat(F.lit(shared + " "), F.regexp_replace("_w", " w", "\nw")),
        )
        .otherwise(F.regexp_replace("_w", "(\\w+ \\w+ \\w+ \\w+ \\w+ \\w+ \\w+ \\w+ \\w+) ", "$1\n"))
        .alias("text"),
    )


def synth_events(spark, n_events: int):
    """Deterministic event stream: ~1000 users, 5 event types, timestamps
    scattered over 30 days (so sessions, rollup buckets, and as-of
    candidates all have realistic density)."""
    from pyspark.sql import functions as F

    return spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(SECOND, pmod(hash(id), 2592000),"
            " timestamp'2024-01-01 00:00:00')"
        ).alias("ts"),
        F.pmod(F.hash("id", F.lit(1)), F.lit(1000)).alias("user_id"),
        F.expr(
            "element_at(array('click','view','purchase','error','signup'),"
            " cast(pmod(hash(id, 2), 5) + 1 as int))"
        ).alias("event_type"),
        (F.pmod(F.hash("id", F.lit(3)), F.lit(10000)) / 100.0).alias("value"),
    )


def synth_vecs(spark, n_vecs: int, dim: int = 64):
    from pyspark.sql import functions as F

    comps = F.array(
        *[
            (F.pmod(F.hash(F.col("id"), F.lit(j)), F.lit(2001)) - 1000).cast(
                "float"
            )
            / 1000.0
            for j in range(dim)
        ]
    )
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), comps.alias("embedding")
    )


TRIALS = int(os.environ.get("BENCH_DATAOPS_TRIALS", "3"))


def timed(name, df, rows_in):
    """Best-of-TRIALS wall for one op. The sandbox hypervisor intermittently
    steals 20-25% CPU, which triggers sched_yield spin storms in the
    32-thread JVM (sys-time 50-80%, user ~0%) and inflates individual runs
    up to 25x — a single-shot wall is meaningless here, the minimum across
    trials is the real cost. All trials are printed so a noisy session is
    visible in the record."""
    walls = []
    n = None
    for _ in range(TRIALS):
        t0 = time.time()
        n = df.count()
        walls.append(round(time.time() - t0, 3))
    wall = min(walls)
    print(json.dumps({
        "op": name, "wall_sec": wall, "trials": walls, "rows_out": n,
        "rows_in": rows_in,
        "rows_in_per_sec": round(rows_in / wall) if wall else None,
    }), flush=True)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    from pyspark.sql import functions as F

    from pyld_spark.operators.dedup import duplicate_spans
    from pyld_spark.operators.entity_resolution import (
        canonical_entity_map, rewrite_triples,
    )
    from pyld_spark.operators.inference import entailed_types
    from pyld_spark.operators.repetition import repetition_stats
    from pyld_spark.operators.similarity import (
        ivf_topk_quantized, kmeans_centroids,
    )
    from pyld_spark.session import ensure_workers_can_import, get_spark

    spark = get_spark("bench_dataops", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ensure_workers_can_import(spark)
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n_docs).localCheckpoint()
    _ = docs.count()
    timed("repetition_stats", repetition_stats(docs), n_docs)
    timed("duplicate_spans(k=10)", duplicate_spans(docs, k=10), n_docs)

    # composed 5-stage curation ledger (round-5 verdict item 7): one
    # content-hash exchange for the whole chain — see the plan pin in
    # tests/test_curation.py. Timed via the noop SINK, not count():
    # count() lets Catalyst prune every per-row column (language/quality)
    # and reports only the window+join skeleton. lang='und' matches the
    # synthetic vocab so all five ladder rungs stay live.
    from pyld_spark.operators.curation import curate_documents

    led = curate_documents(docs, lang="und")
    lwalls = []
    for _ in range(TRIALS):
        t0 = time.time()
        led.write.format("noop").mode("overwrite").save()
        lwalls.append(round(time.time() - t0, 3))
    print(json.dumps({
        "op": "curation_ledger(5-stage,noop-sink)",
        "wall_sec": min(lwalls), "trials": lwalls, "rows_out": n_docs,
        "rows_in": n_docs,
        "rows_in_per_sec": round(n_docs / min(lwalls)),
    }), flush=True)

    vecs = synth_vecs(spark, n_vecs).localCheckpoint()
    _ = vecs.count()
    queries = vecs.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed(
        "ivf_topk(nlist=64,nprobe=8,16q)",
        ivf_topk_quantized(vecs, queries, k=10, nlist=64, nprobe=8),
        n_vecs,
    )
    kwalls = []
    n = None
    for _ in range(TRIALS):
        t0 = time.time()
        n = kmeans_centroids(vecs, nlist=64, iters=3).count()
        kwalls.append(round(time.time() - t0, 3))
    print(json.dumps({
        "op": "kmeans(nlist=64,iters=3)",
        "wall_sec": min(kwalls), "trials": kwalls, "rows_out": n,
        "rows_in": n_vecs,
    }), flush=True)

    # sameAs rewrite over a synthetic quad table: n_docs*20 quads, 5% of
    # entities in 2-member sameAs classes
    n_ent = max(n_docs // 10, 1000)
    quads = spark.range(n_docs * 20).select(
        F.concat(F.lit("e:"), F.pmod(F.hash("id"), F.lit(n_ent))).alias("subj"),
        F.lit("p:rel").alias("pred"),
        F.lit("IRI").alias("obj_kind"),
        F.concat(F.lit("e:"), F.pmod(F.hash("id", F.lit(1)), F.lit(n_ent))).alias("obj_value"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_language"),
        F.lit("@default").alias("graph"),
    ).localCheckpoint()
    _ = quads.count()
    edges = spark.range(n_ent // 20).select(
        F.concat(F.lit("e:"), F.col("id") * 20).alias("src"),
        F.concat(F.lit("e:"), F.col("id") * 20 + 1).alias("dst"),
    )
    t0 = time.time()
    mapping = canonical_entity_map(edges).localCheckpoint()
    _ = mapping.count()
    map_wall = round(time.time() - t0, 3)
    timed("sameas_rewrite(5% merged)", rewrite_triples(quads, mapping), n_docs * 20)
    print(json.dumps({"op": "canonical_entity_map", "wall_sec": map_wall,
                      "rows_in": n_ent // 20}), flush=True)

    # entailment: depth-8 chain ontology applied to n_docs*2 type facts
    onto = spark.createDataFrame(
        [(f"C{i}", f"C{i+1}") for i in range(8)], "sub string, sup string"
    )
    facts = spark.range(n_docs * 2).select(
        F.concat(F.lit("x:"), F.col("id")).alias("instance"),
        F.concat(F.lit("C"), F.pmod(F.hash("id"), F.lit(8))).alias("cls"),
    )
    timed("entailed_types(depth-8 chain)", entailed_types(facts, onto), n_docs * 2)

    # temporal + sketch + keyword ops (round-4 tail additions)
    from pyld_spark.operators.intervals import interval_join
    from pyld_spark.operators.keywords import bm25_scores, tfidf_top_terms
    from pyld_spark.operators.rollup import time_rollup
    from pyld_spark.operators.sessions import session_stats
    from pyld_spark.operators.sketches import kmv_distinct
    from pyld_spark.operators.temporal import asof_join

    n_events = n_docs * 10
    events = synth_events(spark, n_events).localCheckpoint()
    _ = events.count()
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value")
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value")
    timed(
        "asof_join(purchase<-error)",
        asof_join(purchases, errors, by=("user_id",), tie_col="event_id",
                  tolerance_seconds=3600.0),
        n_events,
    )
    error_sessions = session_stats(
        events.where(F.col("event_type") == "error"), gap_seconds=3600
    ).select(
        "user_id", "session_seq",
        (F.col("started") - F.expr("INTERVAL 600 SECONDS")).alias("started"),
        (F.col("ended") + F.expr("INTERVAL 600 SECONDS")).alias("ended"),
    )
    timed(
        "interval_join(purchases-in-error-sessions)",
        interval_join(purchases, error_sessions, bin_seconds=3600,
                      interval_cols=("session_seq",)),
        n_events,
    )
    timed("time_rollup(minute/hour/day)",
          time_rollup(events, grains=("minute", "hour", "day")), n_events)
    timed("kmv_distinct(users-per-type,k=256)",
          kmv_distinct(events, "user_id", by=("event_type",), k=256),
          n_events)
    timed("tfidf_top_terms(k=5)", tfidf_top_terms(docs, k=5), n_docs)
    timed("bm25_scores(3 terms)",
          bm25_scores(docs, ["w1", "w2", "s1"]), n_docs)

    # sampling + quantile ops (round-4 tail additions)
    from pyld_spark.operators.quantiles import exact_quantiles
    from pyld_spark.operators.sampling import cap_per_group, priority_sample

    weighted = docs.select(
        "doc_id",
        F.pmod(F.hash("doc_id"), F.lit(50)).alias("grp"),
        (F.pmod(F.hash("doc_id", F.lit(7)), F.lit(5000)) + 1).alias("w"),
    ).localCheckpoint()
    _ = weighted.count()
    timed("priority_sample(k=20,50 groups)",
          priority_sample(weighted, "doc_id", "w", k=20, by=("grp",)),
          n_docs)
    timed("cap_per_group(k=100,50 groups)",
          cap_per_group(weighted, "doc_id", ("grp",), k=100), n_docs)
    timed("exact_quantiles(5q,50 groups,refine=1)",
          exact_quantiles(weighted, "w", by=("grp",), n_bins=4096), n_docs)

    spark.stop()


if __name__ == "__main__":
    main()
