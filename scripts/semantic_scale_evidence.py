"""Measured scaling evidence for the semantic-dedup family (SCALE.md
round-12 closures).

Two claims to pin with numbers:

1. **The Lloyd fit is corpus-linear** — (n_iter + 1) corpus passes, each a
   zero-shuffle broadcast assignment + a k×dim-partial update exchange —
   even while k GROWS with the corpus (the deployment rule
   k ≈ N / target_cluster_size keeps per-cluster membership constant).
2. **The pair stage is sum(mᵢ²)-bounded, not n²-bounded**: with k ∝ N the
   expected per-cluster membership m stays constant, so pair work grows
   ~linearly in N while the exact tier's n² grows 16× per 4× corpus.
   The run PROVES the bound arithmetic per size (Σ mᵢ² computed from the
   actual fitted assignment) alongside the wall time.

Corpus: deterministic synthetic embeddings — ``n_true`` latent unit
directions in R^dim (seeded numpy), each vector = a direction + small
noise, 2% planted near-dup pairs (vector i copies i-1 with one component
nudged whenever i % 50 == 1).  Near-dups are ~parallel, so they share a
cluster under ANY sane fit; the measured pair stage must surface at least
the planted pairs at cos >= 0.99 (a correctness floor, not a recall
ceiling — noise twins can legitimately exceed it).

Usage:  python scripts/semantic_scale_evidence.py
        SEM_SIZES=50000,200000,800000 python scripts/semantic_scale_evidence.py

Fixtures under /tmp/semscale (atomic rename on write — a killed run must
not leave a torn parquet a later sweep silently reuses).  Single-box
local[32]: the signal is the growth RATE between sizes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

OUTDIR = "/tmp/semscale"
DIM = 16
PER_CLUSTER = 1_000  # deployment rule: k = N / PER_CLUSTER


def _sizes() -> list[int]:
    raw = os.environ.get("SEM_SIZES")
    if not raw:
        return [50_000, 200_000, 800_000]
    sizes = [int(s) for s in raw.split(",")]
    if any(n < PER_CLUSTER for n in sizes):
        raise SystemExit(f"sizes must be >= {PER_CLUSTER} (k = N/{PER_CLUSTER})")
    return sizes


def generate(n: int) -> str:
    """Deterministic clustered embeddings; atomic write."""
    path = f"{OUTDIR}/emb_{n}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(OUTDIR, exist_ok=True)
    rng = np.random.RandomState(42)
    n_true = max(8, n // (PER_CLUSTER * 2))  # 2 fitted clusters per latent
    dirs = rng.randn(n_true, DIM)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    which = rng.randint(0, n_true, size=n)
    vecs = dirs[which] + 0.05 * rng.randn(n, DIM)
    # planted near-dups: i copies i-1 with one component nudged
    dup = np.arange(1, n) % 50 == 1
    idx = np.arange(1, n)[dup]
    vecs[idx] = vecs[idx - 1]
    vecs[idx, 0] += 1e-4
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float64)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import dedup, similarity
    from bulkfhirloader_spark.session import get_spark

    spark = get_spark(app_name="semantic-scale", shuffle_partitions=32)
    rows = []
    for n in _sizes():
        path = generate(n)
        # the generator writes ONE parquet file; without an explicit
        # repartition Spark scans it as ONE input partition and the whole
        # fit runs on a single core (observed: load pinned at 1.0 for the
        # 800k fit) — measurement must reflect the parallel plan
        emb = spark.read.parquet(path).repartition(64).persist()
        emb.count()
        k = n // PER_CLUSTER
        t0 = time.monotonic()
        cents = similarity.kmeans_centroids(emb, k=k, n_iter=2)
        assigned = similarity.classify_nearest_centroid(
            emb, cents, id_cols=("vec_id",)
        ).select("vec_id", F.col("predicted_label").alias("cluster_id"))
        assigned.write.mode("overwrite").parquet(f"{OUTDIR}/assign_{n}.parquet")
        fit_s = time.monotonic() - t0
        # the blas tier on the same fit: one Arrow/dgemm pass per
        # iteration instead of k x dim interpreted fold nodes per row
        t0 = time.monotonic()
        similarity.kmeans_assign(emb, k=k, n_iter=2, assign_tier="blas").write.mode(
            "overwrite"
        ).parquet(f"{OUTDIR}/assign_blas_{n}.parquet")
        fit_blas_s = time.monotonic() - t0
        # SYMMETRIC parity: one-directional exceptAll would report 0 for
        # rows the blas tier silently dropped (r12 review)
        blas_df = spark.read.parquet(f"{OUTDIR}/assign_blas_{n}.parquet").select(
            "vec_id", "cluster_id"
        )
        fold_df = spark.read.parquet(f"{OUTDIR}/assign_{n}.parquet")
        blas_match = blas_df.exceptAll(fold_df).count() + fold_df.exceptAll(
            blas_df
        ).count()
        # the bound arithmetic, from the ACTUAL fit: sum(m_i^2) vs n^2
        sizes_df = (
            spark.read.parquet(f"{OUTDIR}/assign_{n}.parquet")
            .groupBy("cluster_id")
            .count()
        )
        agg = sizes_df.agg(
            F.sum(F.col("count") * F.col("count")).alias("sum_m2"),
            F.max("count").alias("max_m"),
            F.count(F.lit(1)).alias("n_clusters"),
        ).collect()[0]
        t0 = time.monotonic()
        pairs = dedup.semantic_dedup_pairs(
            emb,
            threshold=0.99,
            precomputed_assignments=spark.read.parquet(
                f"{OUTDIR}/assign_{n}.parquet"
            ),
        )
        n_pairs = pairs.count()
        pair_s = time.monotonic() - t0
        planted = len([i for i in range(1, n) if i % 50 == 1])
        rec = {
            "n": n,
            "k": k,
            "fit_s": round(fit_s, 1),
            "fit_blas_s": round(fit_blas_s, 1),
            "blas_assign_mismatches": blas_match,
            "pair_stage_s": round(pair_s, 1),
            "sum_m2": int(agg["sum_m2"]),
            "n2": n * n,
            "bound_ratio": round(n * n / agg["sum_m2"], 1),
            "max_cluster": int(agg["max_m"]),
            "n_clusters": int(agg["n_clusters"]),
            "pairs@0.99": n_pairs,
            "planted": planted,
        }
        # correctness floor: every planted pair shares a cluster and scores
        assert n_pairs >= planted, rec
        rows.append(rec)
        print(json.dumps(rec))
        # each size's cache would otherwise stack under the next size's
        # run and skew the growth-rate signal (r12 review)
        emb.unpersist()
    print(json.dumps({"sweep": rows}))


def gate_sweep() -> None:
    """Streaming semantic gate at a 500k static corpus: per-micro-batch
    durations from the query's own progress events.  The claim under
    test: batch 0 pays the static side's one-time assignment + cache
    fill; later batches join from cached, already-partitioned blocks and
    pay only the (tiny) stream side.  Usage:
    ``python scripts/semantic_scale_evidence.py gate``.

    r13 knobs (the r12 verdict's two named levers, measured):
    - ``GATE_STORE=1``  — static side from a pre-written BUCKETED
      semantic store (semantic_store_write) instead of the per-session
      assign+cache: batch 0 should collapse to ~a scan.  The store-write
      cost is reported separately (it amortizes over every restart).
    - ``GATE_K=5000``   — override k (default n/1000): the fold stream
      side's literal tree is k x dim expression nodes per row, the
      blas tier is one dgemm per batch.
    - ``GATE_TIER=blas`` — stream-side assignment tier.
    - ``GATE_TIMEOUT_S`` — abort the drain after this budget and report
      what completed (the fold-at-large-k DNF case)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import similarity
    from bulkfhirloader_spark.session import get_spark
    from bulkfhirloader_spark.streaming.joins import (
        semantic_store_write,
        stream_semantic_admission,
    )

    spark = get_spark(app_name="semantic-gate-scale", shuffle_partitions=32)
    n = int(os.environ.get("GATE_STATIC_N", 500_000))
    k = int(os.environ.get("GATE_K", n // PER_CLUSTER))
    tier = os.environ.get("GATE_TIER", "fold")
    use_store = os.environ.get("GATE_STORE") == "1"
    timeout_s = float(os.environ.get("GATE_TIMEOUT_S", "0")) or None
    path = generate(n)
    static = spark.read.parquet(path).repartition(64)
    t0 = time.monotonic()
    cents_df = similarity.kmeans_centroids(
        static, k=k, n_iter=2, assign_tier="blas"
    )
    cents = sorted(
        (int(r["c_label"]), list(r["centroid"])) for r in cents_df.collect()
    )
    fit_s = time.monotonic() - t0
    # 3 micro-batches of 2k arriving vectors each: same latent directions,
    # ids offset past the corpus
    src = tempfile.mkdtemp(prefix="semgate_")
    try:
        store_write_s = None
        store_tier = os.environ.get("GATE_STORE_TIER", "fold")
        if use_store:
            t0 = time.monotonic()
            semantic_store_write(
                static, f"{src}/semstore", cents, num_buckets=32,
                assign_tier=store_tier,
            )
            store_write_s = time.monotonic() - t0
        base = spark.read.parquet(path).limit(6_000).select(
            (F.col("vec_id") + n).alias("vec_id"), "embedding"
        )
        for b in range(3):
            base.where((F.col("vec_id") - n) % 3 == b).coalesce(1).write.parquet(
                f"{src}/in/f{b}"
            )
        schema = spark.read.parquet(f"{src}/in/f0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/in/*")
        )
        t0 = time.monotonic()
        gate_t0 = time.monotonic()
        if use_store:
            gated = stream_semantic_admission(
                stream, threshold=0.99, semantic_store=f"{src}/semstore",
                assign_tier=tier,
            )
        else:
            gated = stream_semantic_admission(
                stream, static, cents, threshold=0.99, assign_tier=tier
            )
        gate_build_s = time.monotonic() - gate_t0
        q = (
            gated.writeStream.format("memory")
            .queryName("semgate_scale")
            .outputMode("append")
            .option("checkpointLocation", f"{src}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        timed_out = False
        if timeout_s is not None:
            timed_out = not q.awaitTermination(timeout_s)
            if timed_out:
                q.stop()
        else:
            q.awaitTermination()
        drain_s = time.monotonic() - t0
        batches = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "batch_s": round(p["batchDuration"] / 1000.0, 1),
            }
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        admitted = spark.table("semgate_scale").count()
        print(
            json.dumps(
                {
                    "gate_static_n": n,
                    "k": k,
                    "tier": tier,
                    "stored_static": use_store,
                    "store_tier": store_tier if use_store else None,
                    "fit_blas_s": round(fit_s, 1),
                    # `is not None`, not truthiness: a sub-0.05 s write
                    # rounds to 0.0 and must still read as "ran", not as
                    # GATE_STORE-off (r13 advice)
                    "store_write_s": (
                        round(store_write_s, 1) if store_write_s is not None
                        else None
                    ),
                    "gate_build_s": round(gate_build_s, 1),
                    "drain_s": round(drain_s, 1),
                    "timed_out": timed_out,
                    "batches": batches,
                    "admitted": admitted,
                }
            )
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


def _driver_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return round(int(ln.split()[1]) / 1024.0, 1)
    return -1.0


def chained_sweep() -> None:
    """r13 (r12 verdict #3): the collect-free chained Lloyd tier at
    k = 10^4 — past the collected tier's per-iteration k x dim x 8 B
    driver round-trip — with the PYTHON DRIVER's RSS sampled around the
    fit.  The chained tier's centroid bytes on the driver are
    structurally ZERO (no collect anywhere on the centroid path — they
    live as a localCheckpoint on executors); the RSS samples make that
    visible, and the collected tier runs the same shape for contrast
    (its per-iteration round-trip is k x dim x 8 = reported).  Usage:
    ``python scripts/semantic_scale_evidence.py chained``; knobs
    CHAINED_N (default 50_000), CHAINED_K (default 10_000).

    r14 (r13 verdict #6): the chained fit now FEEDS the family — the
    sweep also times (a) semantic_dedup_pairs(precomputed_centroids=
    chained) — the broadcast assignment, zero centroid bytes through the
    Python driver — and (b) semantic_store_write under the chained fit
    (blas write tier, the large-k necessity), so the measured path is
    fit → store → gate end to end, not the fit in isolation.

    r15 (r14 verdict #1): also times semantic_dedup_pairs(
    precomputed_centroids=chained, assign_tier="blas") — the dgemm
    assignment on the pair stage itself (the r14 run showed the FOLD
    pair stage at 185.7 s vs 12.6 s for the same dgemm inside the store
    write, i.e. the chained fit's consumer was the new bottleneck) —
    and counts pair mismatches between the two tiers at full k."""
    import shutil
    import tempfile

    from bulkfhirloader_spark.operators import dedup, similarity
    from bulkfhirloader_spark.session import get_spark
    from bulkfhirloader_spark.streaming.joins import semantic_store_write

    spark = get_spark(app_name="semantic-chained-scale", shuffle_partitions=32)
    n = int(os.environ.get("CHAINED_N", 50_000))
    k = int(os.environ.get("CHAINED_K", 10_000))
    path = generate(n)
    emb = spark.read.parquet(path).repartition(64).persist()
    emb.count()
    rss0 = _driver_rss_mb()
    t0 = time.monotonic()
    chained = similarity.kmeans_centroids_chained(emb, k=k, n_iter=2)
    n_cents = chained.count()
    chained_s = time.monotonic() - t0
    rss1 = _driver_rss_mb()
    t0 = time.monotonic()
    collected = similarity.kmeans_centroids(emb, k=k, n_iter=2)
    n_cents_c = collected.count()
    collected_s = time.monotonic() - t0
    rss2 = _driver_rss_mb()
    # parity at full k too (not just the pytest's small k): identical fits
    mism = (
        chained.exceptAll(collected).count()
        + collected.exceptAll(chained).count()
    )
    # r14: the chained fit FEEDING the family — pair stage via the
    # broadcast assignment (no driver round-trip of the centroids) and
    # the bucketed store write (blas assign tier, the large-k path)
    t0 = time.monotonic()
    n_pairs = dedup.semantic_dedup_pairs(
        emb, threshold=0.99, precomputed_centroids=chained
    ).count()
    pairs_chained_s = time.monotonic() - t0
    # r15: the dgemm assignment on the pair stage (r14 verdict #1) — the
    # one-call deployment pairing chained fit -> blas assign -> pairs
    t0 = time.monotonic()
    blas_pairs = dedup.semantic_dedup_pairs(
        emb, threshold=0.99, precomputed_centroids=chained,
        assign_tier="blas",
    ).select("id_a", "id_b", "cluster_id").persist()
    n_pairs_blas = blas_pairs.count()
    pairs_blas_s = time.monotonic() - t0
    # persist both sides before the two exceptAll counts — without the
    # pins the audit re-runs the full pair stages (~3x executions of the
    # sweep's most expensive path for no extra evidence)
    fold_pairs = (
        dedup.semantic_dedup_pairs(
            emb, threshold=0.99, precomputed_centroids=chained
        ).select("id_a", "id_b", "cluster_id").persist()
    )
    pair_mism = (
        fold_pairs.exceptAll(blas_pairs).count()
        + blas_pairs.exceptAll(fold_pairs).count()
    )
    fold_pairs.unpersist()
    blas_pairs.unpersist()
    store_dir = tempfile.mkdtemp(prefix="semchained_store_")
    try:
        t0 = time.monotonic()
        semantic_store_write(
            emb, f"{store_dir}/semstore", chained, num_buckets=32,
            assign_tier="blas",
        )
        store_write_s = time.monotonic() - t0
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
    rss3 = _driver_rss_mb()
    print(
        json.dumps(
            {
                "n": n,
                "k": k,
                "dim": DIM,
                "chained_fit_s": round(chained_s, 1),
                "collected_fit_s": round(collected_s, 1),
                "fit_mismatches": mism,
                "clusters_chained": n_cents,
                "clusters_collected": n_cents_c,
                "pairs_chained_s": round(pairs_chained_s, 1),
                "pairs@0.99": n_pairs,
                "pairs_chained_blas_s": round(pairs_blas_s, 1),
                "pairs_blas@0.99": n_pairs_blas,
                "pair_tier_mismatches": pair_mism,
                "store_write_blas_s": round(store_write_s, 1),
                "driver_rss_mb": {
                    "before": rss0,
                    "after_chained": rss1,
                    "after_collected": rss2,
                    "after_consumers": rss3,
                },
                "collected_roundtrip_bytes_per_iter": k * DIM * 8,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gate":
        gate_sweep()
    elif len(sys.argv) > 1 and sys.argv[1] == "chained":
        chained_sweep()
    else:
        main()
