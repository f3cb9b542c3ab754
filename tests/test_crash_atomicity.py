"""Kill-during-write tests for the four stores (r10 verdict, Next round
#6): each test injects a mid-job failure into the DATA write and asserts
the documented recovery story — commit-marker ordering means a torn write
is always LOUD on the next touch (validator trip or read failure), never
a silently-wrong probe.  The failure is injected with a mapInPandas
stage that raises once rows flow, so the crash lands inside the Spark
write job itself (after any upstream metadata writes), exactly where a
executor/driver kill would land it.

The SCALE.md "Crash atomicity of the stores" table enumerates the cells;
these tests pin the previously prose-only ones (overwrite commit-marker
under a real mid-write failure for both signature stores, the torn IVF
build, the docstore orphan-manifest-tmp reap)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bulkfhirloader_spark.operators import dedup, similarity


def _raising_mid_job(df, schema: str):
    """A DataFrame whose evaluation raises inside the first task that
    sees rows — the injected 'kill' for write jobs."""

    def boom(batches):
        for pdf in batches:
            if len(pdf):
                raise RuntimeError("injected mid-write failure")
            yield pdf

    return df.mapInPandas(boom, schema)


def test_signature_store_overwrite_kill_keeps_old_meta_and_trips_retry(
    spark, tmp_path
):
    """Overwrite writes DATA first, meta last (store_meta_lifecycle): a
    kill inside the data write must leave the OLD geometry meta as the
    commit marker, so (a) an append-mode retry under the new geometry
    trips the validator loudly, and (b) a read under the old geometry
    fails loudly on the torn data — never a silent wrong probe."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "sig")
    dedup.signature_store_write(docs, store, num_hashes=16, shingle_words=3)
    with pytest.raises(Exception, match="injected mid-write failure"):
        dedup.signature_store_write(
            _raising_mid_job(docs, "doc_id long, text string"),
            store,
            num_hashes=32,
            shingle_words=2,
            mode="overwrite",
        )
    meta = spark.read.parquet(f"{store}/meta.parquet").collect()
    assert [(m["num_hashes"], m["shingle_words"]) for m in meta] == [(16, 3)]
    with pytest.raises(ValueError, match="geometry mismatch"):
        dedup.signature_store_write(
            docs, store, num_hashes=32, shingle_words=2, mode="append"
        )
    # the torn data cannot serve a probe: old-geometry read fails loudly
    # (Spark's overwrite removed the committed files before the job died)
    with pytest.raises(Exception):
        dedup.signature_store_read(spark, store, 16, 3).collect()
    # documented recovery: a clean overwrite retry rebuilds store + meta
    dedup.signature_store_write(
        docs, store, num_hashes=32, shingle_words=2, mode="overwrite"
    )
    assert dedup.signature_store_read(spark, store, 32, 2).count() == 2


def test_banded_store_overwrite_kill_keeps_old_meta_and_trips_retry(
    spark, tmp_path
):
    """Same commit-marker pin for the streaming gate's banded store —
    the ordering lives in each writer (data write, then finalize), so the
    shared-lifecycle test above does not cover this writer by itself."""
    from bulkfhirloader_spark.streaming.joins import (
        banded_signature_store_read,
        banded_signature_store_write,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "bands")
    banded_signature_store_write(docs, store, num_hashes=16, bands=8)
    with pytest.raises(Exception, match="injected mid-write failure"):
        banded_signature_store_write(
            _raising_mid_job(docs, "doc_id long, text string"),
            store,
            num_hashes=8,
            bands=4,
            mode="overwrite",
        )
    meta = spark.read.parquet(f"{store}/meta.parquet").collect()
    assert [(m["num_hashes"], m["bands"]) for m in meta] == [(16, 8)]
    with pytest.raises(ValueError, match="geometry mismatch"):
        banded_signature_store_write(
            docs, store, num_hashes=8, bands=4, mode="append"
        )
    with pytest.raises(Exception):
        banded_signature_store_read(spark, store, 16, 8, 3)[0].collect()


def test_ivf_build_kill_after_centroids_is_loud_everywhere(spark, tmp_path):
    """build_ivf_index writes centroids FIRST, lists second; the lists
    write is the long job, so a kill lands between them.  The torn index
    must fail loudly on query (lists missing) AND on a same-path rebuild
    (centroids write refuses to overwrite) — recovery is rebuild at a
    fresh path (or delete), never a silent empty probe."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    centers = [[0.0, 1.0], [1.0, 0.0]]
    with pytest.raises(Exception, match="injected mid-write failure"):
        similarity.build_ivf_index(
            _raising_mid_job(emb, "vec_id long, embedding array<double>"),
            idx,
            precomputed_centroids=centers,
        )
    # the quantizer committed, the lists did not
    assert os.path.isdir(f"{idx}/centroids.parquet")
    q = spark.createDataFrame(
        [(100, [0.0, 1.0])], "query_id long, query_vec array<double>"
    )
    with pytest.raises(Exception):
        similarity.query_ivf_index(spark, idx, q, k=2).collect()
    with pytest.raises(Exception):  # path-exists refusal on retry
        similarity.build_ivf_index(emb, idx, precomputed_centroids=centers)
    # documented recovery: fresh path
    idx2 = str(tmp_path / "ivf2")
    similarity.build_ivf_index(emb, idx2, precomputed_centroids=centers)
    assert similarity.query_ivf_index(spark, idx2, q, k=2, n_probe=2).count() == 2


def test_ivf_append_crash_replay_duplicates_closed_by_dedupe_ids(spark, tmp_path):
    """SCALE.md crash table row 3 (r12 close): an append whose WRITE
    committed but whose caller crashed before recording it gets blindly
    re-appended on recovery — the lists then hold each re-appended id
    twice, and an exact probe surfaces the duplicates.  Pin both halves:
    the default probe DOES show duplicate ids after the replay (the
    documented caveat, not silently masked), and ``dedupe_ids=True``
    returns k DISTINCT ids with the same top-score ordering."""
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0 + 0.01 * i]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / "ivf")
    centers = [[0.0, 1.0], [1.0, 0.0]]
    first = emb.where("vec_id < 8")
    extra = emb.where("vec_id >= 8")
    similarity.build_ivf_index(first, idx, precomputed_centroids=centers)
    similarity.append_ivf_index(extra, idx)
    # crash-replay: the recovery job re-appends the already-committed batch
    similarity.append_ivf_index(extra, idx)

    q = spark.createDataFrame(
        [(100, [1.0, 1.1])], "query_id long, query_vec array<double>"
    )
    base = similarity.query_ivf_index(spark, idx, q, k=12, n_probe=2).collect()
    ids = [r["vec_id"] for r in base]
    assert len(ids) != len(set(ids))  # the caveat is real
    # raw reference map over the FULL candidate set (k past the dup rows)
    base = similarity.query_ivf_index(spark, idx, q, k=24, n_probe=2).collect()
    deduped = similarity.query_ivf_index(
        spark, idx, q, k=12, n_probe=2, dedupe_ids=True
    ).collect()
    dids = [r["vec_id"] for r in deduped]
    assert len(dids) == len(set(dids)) == 12
    # scores survive the keep-max dedup: every returned (id, score) pair
    # appears in the raw result, and ranks stay score-descending
    raw_best = {}
    for r in base:
        raw_best[r["vec_id"]] = max(raw_best.get(r["vec_id"], -2.0), r["score"])
    for r in deduped:
        assert abs(raw_best[r["vec_id"]] - r["score"]) < 1e-12
    scores = [r["score"] for r in sorted(deduped, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_docstore_orphan_manifest_tmp_is_reaped_under_lock(spark, tmp_path):
    """A crash between writing `_manifest.json.tmp-<hex>` and its
    os.replace leaves the tmp behind; the next flock-holding save must
    reap it and publish a correct manifest (r10 review fix, plus the r10
    advisor's guard that the reap only runs when the lock was actually
    acquired — on POSIX, as here, it is)."""
    from bulkfhirloader_spark.sinks.docstore_stub import FileDocStoreDataSource
    from bulkfhirloader_spark.sinks.facts import write_resources_mongo

    spark.dataSource.register(FileDocStoreDataSource)
    root = str(tmp_path / "store")
    coll_dir = f"{root}/fhir/patients"
    os.makedirs(coll_dir)
    orphan = f"{coll_dir}/_manifest.json.tmp-deadbeef"
    with open(orphan, "w") as fh:
        fh.write('{"torn": true}')
    entries = spark.createDataFrame(
        [(f"id{i}", "patients", f'{{"n":{i}}}') for i in range(5)],
        "resource_id string, collection string, body string",
    )
    write_resources_mongo(
        entries, f"docstore://{root}", "fhir", format="filedocstore"
    )
    assert not os.path.exists(orphan)
    manifest = json.load(open(f"{coll_dir}/_manifest.json"))
    assert manifest["n_docs"] == 5
