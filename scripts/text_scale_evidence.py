"""Measured scaling evidence for the text-analysis family (SCALE.md).

Reuses the dedup family's deterministic synthetic corpora (generate via
scripts/scale_evidence.py, which writes /tmp/scaledocs/d{5k,50k,500k}),
and times the projection-shaped and aggregation-shaped text operators at
each size:

- ``quality``     — quality_stats: pure projection, should be scan-bound
- ``langid``      — language_id: pure projection (stoplist literals let-bound)
- ``fingerprint`` — rolling-hash fingerprint: projection
- ``bm25``        — bm25_topk: posting filter before any shuffle + two tiny
  aggs + TakeOrdered; cost should track the MATCHED postings, not the corpus
- ``invidx``      — inverted_index: the one genuinely term-shuffling op
  (bounded posting lists), expected ~linear

Usage:  python scripts/text_scale_evidence.py   (regenerates corpora if absent)
Single-box local[32]; the signal is growth rate across sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [(5_000, "d5k"), (50_000, "d50k"), (500_000, "d500k")]
OUTDIR = "/tmp/scaledocs"


def main() -> None:
    if not os.path.exists(f"{OUTDIR}/d500k.parquet"):
        import scale_evidence

        scale_evidence.generate()

    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import text
    from bulkfhirloader_spark.session import get_spark

    spark = get_spark(app_name="text-scale-evidence")
    tm = time.monotonic

    def force(df) -> None:
        # .count() lets Catalyst PRUNE a projection's columns entirely —
        # the op would measure as free.  Hash every output column into an
        # aggregate so the whole result is genuinely computed.
        # mask to 40 bits so the ANSI sum cannot overflow a long
        h = F.xxhash64(F.struct(*df.columns)).bitwiseAND(F.lit((1 << 40) - 1))
        df.agg(F.sum(h)).collect()

    for n, name in SIZES:
        docs = spark.read.parquet(f"{OUTDIR}/{name}.parquet")
        docs.count()  # warm the scan
        res = {}
        t0 = tm()
        force(text.quality_stats(docs))
        res["quality"] = tm() - t0
        t0 = tm()
        force(text.language_id(docs))
        res["langid"] = tm() - t0
        t0 = tm()
        force(text.fingerprint(docs))
        res["fingerprint"] = tm() - t0
        t0 = tm()
        # query terms drawn from the synthetic vocab (w0..w9999)
        force(text.bm25_topk(docs, ["w17", "w423", "w999"], k=20, idf="rational"))
        res["bm25"] = tm() - t0
        t0 = tm()
        force(text.inverted_index(docs, max_postings=20))
        res["invidx"] = tm() - t0
        # r13: winnowing — per-gram char-fold hash (projection-shaped,
        # O(text)) + ONE per-doc window Exchange + a distinct; expected
        # ~linear like invidx, never quadratic (the candidate join is a
        # separate op and is df-capped)
        t0 = tm()
        force(text.winnow_fingerprints(docs))
        res["winnow"] = tm() - t0
        # r14: the xxhash64 deployment tier — same plan shape, the
        # interpreted char-fold HOF replaced by one codegen hash call;
        # the fold-vs-xxh ratio IS the interpreted-hot-loop cost
        t0 = tm()
        force(text.winnow_fingerprints(docs, hash_tier="xxhash64"))
        res["winnow_xxh"] = tm() - t0
        # r15: BPE trainer — per round one explode+groupBy pair count
        # (map-side partials), a 1-row TakeOrdered winner, one O(len)
        # re-segmentation fold behind an eager checkpoint; expected
        # ~linear in corpus per round and ~linear in rounds (the
        # checkpoint chain keeps round i's count pass from re-running
        # rounds 0..i-1's folds)
        t0 = tm()
        m2 = text.bpe_merge_rounds(docs, n_merges=2).collect()
        res["bpe2"] = tm() - t0
        t0 = tm()
        m8 = text.bpe_merge_rounds(docs, n_merges=8).collect()
        res["bpe8"] = tm() - t0
        assert [tuple(r) for r in m8[:2]] == [tuple(r) for r in m2], (
            "merge-table prefix mismatch between n_merges=2 and 8"
        )
        print(
            f"{name:6s} " + "  ".join(f"{k}={v:5.1f}s" for k, v in res.items()),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
