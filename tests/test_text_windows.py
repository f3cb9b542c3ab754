"""Text-analysis + event-window semantics on hand-built fixtures."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from bulkfhirloader_spark.operators import text, windows


def test_quality_stats_empty_doc_survives(spark):
    """ANSI divide-by-zero guard: an empty doc yields NULL ratios, not a
    job-killing exception (ADVICE r1, medium)."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in text.quality_stats(df).collect()}
    assert rows[1]["n_tokens"] == 2
    assert rows[2]["n_tokens"] == 0 and rows[2]["avg_token_len"] is None
    assert rows[3]["n_tokens"] == 0 and rows[3]["stopword_ratio"] is None


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a box", "en"),
            (2, "el perro y la casa en los campos", "es"),
            (3, "zzz qqq xxx", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in text.language_id(df).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "es"
    assert rows[3]["lang_pred"] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "hello world!")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.fingerprint(df).collect()}
    assert rows[1]["fp_md5"] == rows[2]["fp_md5"]
    assert rows[1]["fp_rolling"] == rows[2]["fp_rolling"]
    assert rows[1]["fp_md5"] != rows[3]["fp_md5"]


def test_quality_stats_match_python_reference_on_random_corpus(spark):
    """Cross-validate the Catalyst quality features against an independent
    Python re-implementation over a seeded random corpus (mixed scripts,
    whitespace runs, empty and punctuation-only docs) — one Spark job."""
    import random
    import re

    rng = random.Random(42)
    alphabet = "abcXYZ \t\n.,;:!?0189éß€ the of"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120))))
        for i in range(300)
    ]
    rows += [(900, ""), (901, " \t\n "), (902, "...!!!"), (903, "the the THE")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.quality_stats(docs).collect()}

    stop_en = {"the", "a", "of", "and", "to", "in", "is"}
    for doc_id, s in rows:
        toks = re.findall(r"\S+", s)
        n_chars = len(s)
        n_alpha = len(re.sub(r"[^A-Za-z]", "", s))
        n_punct = len(re.sub(r"[^.,;:!?]", "", s))
        n_stop = sum(1 for t in toks if t.lower() in stop_en)
        r = got[doc_id]
        assert r["n_tokens"] == len(toks), (doc_id, s)
        assert r["n_chars_computed"] == n_chars
        if not toks:
            assert r["avg_token_len"] is None and r["stopword_ratio"] is None
        else:
            assert abs(r["avg_token_len"] - n_chars / len(toks)) < 1e-9
            assert abs(r["stopword_ratio"] - n_stop / len(toks)) < 1e-9
        if n_chars == 0:
            assert r["alpha_ratio"] is None and r["punct_ratio"] is None
        else:
            assert abs(r["alpha_ratio"] - n_alpha / n_chars) < 1e-9
            assert abs(r["punct_ratio"] - n_punct / n_chars) < 1e-9


def test_repetition_stats_bigram_golden(spark):
    """Hand-derived: 'a b a b c' bigrams are [a b, b a, a b, b c] ->
    4 total, 3 distinct, top count 2; degenerate docs (one token, empty)
    yield zero counts and NULL ratios, not a divide-by-zero."""
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "solo"), (3, ""), (4, "x x x x")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.repetition_stats(docs, n=2).collect()}
    r1 = rows[1]
    assert (r1["n_ngrams"], r1["n_distinct"], r1["top_ngram_count"]) == (4, 3, 2)
    assert r1["dup_ngram_frac"] == 0.25 and r1["top_ngram_share"] == 0.5
    for d in (2, 3):
        assert rows[d]["n_ngrams"] == 0 and rows[d]["n_distinct"] == 0
        assert rows[d]["dup_ngram_frac"] is None
    r4 = rows[4]  # 'x x' three times: the boilerplate signature
    assert (r4["n_ngrams"], r4["n_distinct"], r4["top_ngram_count"]) == (3, 1, 3)
    assert r4["dup_ngram_frac"] == pytest.approx(2 / 3)
    assert r4["top_ngram_share"] == 1.0


def test_repetition_stats_zero_shuffle_plan(spark):
    """The sorted-run fold must stay a projection: no Exchange, no
    Python/pandas UDF in the plan."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = text.repetition_stats(docs, n=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_count_bpe_ish(spark):
    got = (
        spark.createDataFrame([("don't stop, it's 42!",)], ["t"])
        .select(text.token_count_bpe_ish(F.col("t")).alias("n"))
        .first()["n"]
    )
    # don / ' / t / stop / , / it / ' / s / 4 / 2 / !
    assert got == 11


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two events 2 min apart (one session), then 10-min gap (new session)
        (1, t0, 1, "click", 1.0),
        (2, t0 + datetime.timedelta(minutes=2), 1, "click", 2.0),
        (3, t0 + datetime.timedelta(minutes=12), 1, "view", 4.0),
        # user 2: single event in the second 10-min window
        (4, t0 + datetime.timedelta(minutes=11), 2, "click", 8.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_tumbling_counts(events):
    rows = {
        (r["window_start"].minute, r["event_type"]): r["n_events"]
        for r in windows.tumbling_counts(events, "10 minutes").collect()
    }
    assert rows[(0, "click")] == 2
    assert rows[(10, "view")] == 1
    assert rows[(10, "click")] == 1


def test_sliding_counts_overlap(events):
    rows = windows.sliding_counts(events, "10 minutes", "5 minutes").collect()
    # event at minute 2 appears in windows starting at -5 and 0
    clicks = [r for r in rows if r["event_type"] == "click"]
    starts = sorted({r["window_start"].minute for r in clicks})
    assert len(starts) >= 3  # overlapping windows produced


def test_session_windows(events):
    rows = windows.session_stats(events, "5 minutes").collect()
    u1 = sorted(
        [r for r in rows if r["user_id"] == 1], key=lambda r: r["session_start"]
    )
    assert len(u1) == 2  # 10-min gap splits the session
    assert u1[0]["n_events"] == 2 and u1[1]["n_events"] == 1
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1


def test_redact_pii_masks_and_counts(spark):
    from bulkfhirloader_spark.operators.text import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail alice.b+spam@ex-mail.co.uk or call 555-123-4567 now"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and 111-222-3333 999-888-7777"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[1]["redacted_text"] == "mail [EMAIL] or call [PHONE] now"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    assert rows[2]["redacted_text"] == "no pii here at all"
    assert rows[3]["n_emails"] == 2 and rows[3]["n_phones"] == 2
    assert rows[3]["redacted_text"] == "two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]"


def test_vocab_pair_counts_golden(spark):
    """'a b a b' contributes [a b, b a, a b]; across two docs the top pair
    and deterministic (count desc, pair asc) tie-break are exact."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = text.vocab_pair_counts(docs, top_k=10).collect()
    assert [(r["pair"], r["pair_count"]) for r in rows] == [
        ("a b", 3),
        ("b a", 1),
        ("b c", 1),
    ]


def test_vocab_pair_counts_topk_is_take_ordered(spark):
    """top-k must plan as TakeOrderedAndProject (per-partition heaps),
    never a global Sort materialization."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        text.vocab_pair_counts(docs, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_sessionize_gap_boundaries(spark):
    """Events 0s/30s/largegap/+10s for one user with a 60s gap: sessions
    must break exactly when the gap strictly exceeds the threshold; a
    second user's numbering is independent."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(sec):
        return base + datetime.timedelta(seconds=sec)

    rows = [
        (1, 10, ts(0)),
        (2, 10, ts(30)),
        (3, 10, ts(90)),     # exactly 60s after prev: NOT a new session (>)
        (4, 10, ts(151)),    # 61s after prev: new session
        (5, 20, ts(500)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_seq"]
        for r in windows.sessionize(ev, gap_seconds=60).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_single_exchange(spark):
    """Both window passes share the user partitioning — the plan must
    contain exactly one Exchange."""
    ev = spark.createDataFrame(
        [(1, 10, datetime.datetime(2024, 1, 1))],
        "event_id long, user_id long, ts timestamp",
    )
    plan = (
        windows.sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_inverted_index_df_true_and_postings_capped(spark):
    """'x' appears in docs 1,2,3,10 (df=4) but postings are capped at 2 and
    numerically sorted (1,2 — not lexicographic); within-doc repeats don't
    inflate df; min_df filters; bad args raise."""
    docs = spark.createDataFrame(
        [
            (1, "x x y"),
            (2, "x"),
            (3, "x z"),
            (10, "x"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in text.inverted_index(docs, max_postings=2).collect()
    }
    assert got["x"] == (4, "1,2")
    assert got["y"] == (1, "1")
    assert got["z"] == (1, "3")
    only = text.inverted_index(docs, min_df=4).collect()
    assert [(r["term"], r["df"]) for r in only] == [("x", 4)]
    with pytest.raises(ValueError):
        text.inverted_index(docs, max_postings=0)


def test_inverted_index_single_exchange(spark):
    """The window's term partitioning must be reused by the groupBy — one
    Exchange total, and no global distinct shuffle for per-doc term dedup."""
    docs = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = (
        text.inverted_index(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_bm25_ln_and_rational_agree_on_single_term_ranking(spark):
    from bulkfhirloader_spark.operators import text as T

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # single query term: log is monotone, so the two idf modes must produce
    # the SAME doc ranking (scores differ)
    a = [r["doc_id"] for r in T.bm25_topk(docs, ["table"], k=10, idf="ln").collect()]
    b = [
        r["doc_id"]
        for r in T.bm25_topk(docs, ["table"], k=10, idf="rational").collect()
    ]
    assert a == b
    # higher tf at equal length wins
    tiny = spark.createDataFrame(
        [(1, "x x x y y"), (2, "x y y y y")],
        "doc_id long, text string",
    )
    top = T.bm25_topk(tiny, ["x"], k=2).collect()
    assert top[0]["doc_id"] == 1 and top[0]["bm25"] > top[1]["bm25"]


def test_repeated_block_dedup_removes_cross_doc_boilerplate(spark):
    from bulkfhirloader_spark.operators import text as T

    header = "copyright acme corp all rights reserved boilerplate here"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, header + " unique one two three four five six seven"),
            (2, header + " other body words entirely different from one"),
            (3, header + " third doc body with its own words here"),
            (4, "no boilerplate in this document at all okay"),
            (5, header),  # all-boilerplate doc survives as empty text
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           T.repeated_block_dedup(docs, block_tokens=8, max_block_df=2).collect()}
    assert len(out) == 5  # no row vanishes
    for d in (1, 2, 3):
        assert header not in out[d]["clean_text"]
        assert out[d]["n_kept_blocks"] == 1
    assert out[4]["clean_text"].startswith("no boilerplate")
    assert out[5]["clean_text"] == "" and out[5]["n_kept_blocks"] == 0


def test_vocab_coverage_oov_semantics(spark):
    from bulkfhirloader_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),       # 'a' (3) and 'b' (1+1) dominate
            (2, "a b zzz qqq"),   # two OOV tokens at vocab_size=2
            (3, ""),              # token-free: NULL rate, not a crash
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.vocab_coverage(docs, vocab_size=2).collect()}
    assert out[1]["n_oov"] == 0 and out[1]["oov_rate"] == 0.0
    assert out[2]["n_oov"] == 2 and abs(out[2]["oov_rate"] - 0.5) < 1e-9
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] is None


def test_winnow_guarantee_and_short_doc_clamp(spark):
    """Winnowing contract (Schleimer et al. 2003): any shared token run of
    length >= window + k - 1 (= 6 at k=3, w=4) shares at least one
    selected fingerprint; rightmost-min tie rule; short docs (< window
    k-grams) clamp to their single global minimum; docs with < k tokens
    yield nothing."""
    from bulkfhirloader_spark.operators import text as t

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens >= 6
    docs = spark.createDataFrame(
        [
            (1, shared + " near the river bank today"),
            (2, "completely different preamble words here then " + shared),
            (3, "alpha beta gamma delta"),   # 2 grams < window -> clamp
            (4, "just two"),                 # < k tokens -> nothing
        ],
        "doc_id long, text string",
    )
    fps = t.winnow_fingerprints(docs, k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    # the guarantee: 1 and 2 share >= 1 fingerprint
    assert by_doc[1] & by_doc[2]
    # short-doc clamp: doc 3 has exactly its global minimum selected
    assert len(by_doc[3]) == 1
    # sub-k doc yields nothing
    assert 4 not in by_doc
    # selection is ~1/window of the gram stream, never the whole stream
    n_grams_1 = len(docs.where("doc_id = 1").collect()[0]["text"].split()) - 2
    assert len(by_doc[1]) < n_grams_1
    # candidates surface the (1, 2) pair
    cands = t.winnow_candidates(docs, min_shared=1)
    assert {(r["id_a"], r["id_b"]) for r in cands.collect()} == {(1, 2)}


def test_winnow_xxhash64_tier_pair_parity(spark):
    """r14 (r13 verdict #1): the codegen xxhash64 hash tier must find the
    SAME candidate pairs as the oracle fold tier on planted overlaps —
    fingerprint values differ by construction (engine hash vs portable
    fold), so parity is at the PAIR SET, the level the winnowing
    guarantee actually speaks at: any shared run >= window + k - 1
    shares a selected fingerprint under either hash.  Corpus design
    makes the pair set hash-independent: true pairs share runs >= 6
    tokens, non-pairs share ZERO k-grams (disjoint vocabularies)."""
    import pytest as _pytest

    from bulkfhirloader_spark.operators import text as t

    run_a = "aa bb cc dd ee ff gg hh"            # 8 tokens >= 6
    run_b = "k1 k2 k3 k4 k5 k6 k7"               # 7 tokens >= 6
    docs = spark.createDataFrame(
        [
            (1, run_a + " xx yy zz"),
            (2, "p1 p2 p3 p4 " + run_a),
            (3, run_b),
            (4, "q1 q2 q3 " + run_b + " q4 q5"),
            (5, "m1 m2 m3 m4 m5 m6 m7 m8 m9"),   # overlaps nothing
            (6, "n1 n2 n3 n4 n5 n6 n7 n8"),      # overlaps nothing
        ],
        "doc_id long, text string",
    )
    want = {(1, 2), (3, 4)}
    for tier in ("fold", "xxhash64"):
        got = {
            (r["id_a"], r["id_b"])
            for r in t.winnow_candidates(
                docs, min_shared=1, hash_tier=tier
            ).collect()
        }
        assert got == want, tier
    # fingerprint sets themselves are tier-specific (values differ) but
    # the per-doc selection VOLUME contract (~1/window) holds on both
    fold_n = t.winnow_fingerprints(docs, hash_tier="fold").count()
    xxh_n = t.winnow_fingerprints(docs, hash_tier="xxhash64").count()
    assert fold_n > 0 and xxh_n > 0
    with _pytest.raises(ValueError, match="hash_tier"):
        t.winnow_fingerprints(docs, hash_tier="md5")


def test_winnow_fp_array_matches_batch_operator(spark):
    """r14: the streaming-legal expression form must select the
    IDENTICAL fingerprint set as the batch window-function operator —
    same hashes, same rightmost-min tie rule, same short-doc clamp,
    same empty-set contract — under both hash tiers."""
    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "alpha beta gamma delta"),   # 2 grams < window -> clamp
            (3, "just two"),                 # < k tokens -> empty set
            (4, "aa aa aa aa aa aa aa aa"),  # all-equal grams: tie rule
        ],
        "doc_id long, text string",
    )
    for tier in ("fold", "xxhash64"):
        batch = {}
        for r in t.winnow_fingerprints(
            docs, with_positions=False, hash_tier=tier
        ).collect():
            batch.setdefault(r["doc_id"], set()).add(r["fp_hash"])
        expr = {
            r["doc_id"]: set(r["fps"])
            for r in docs.select(
                "doc_id",
                t.winnow_fp_array(F.col("text"), hash_tier=tier).alias("fps"),
            ).collect()
        }
        assert expr[3] == set() and 3 not in batch
        for d in (1, 2, 4):
            assert expr[d] == batch[d], (tier, d)


def test_winnow_verified_measures_exact_shared_runs(spark):
    """r14 (r13 verdict #2): the verify stage joins ACTUAL k-gram strings
    positionally and the diagonal gaps-and-islands yields the exact
    longest-shared-run length — a planted 8-token run measures 8 tokens
    (6 grams at k=3), split runs measure their longest piece, pairs
    below min_run_tokens drop, and the verify is hash-free (identical
    verified pairs under both propose hash tiers)."""
    from bulkfhirloader_spark.operators import text as t

    run8 = "w1 w2 w3 w4 w5 w6 w7 w8"                  # 8 shared tokens
    docs = spark.createDataFrame(
        [
            (1, run8 + " xx yy zz"),
            (2, "p1 p2 p3 " + run8),
            # 5-token shared run (3 grams): proposable at min_shared=1
            # but BELOW the 6-token verify default -> must drop
            (3, "s1 s2 s3 s4 s5 aa bb cc"),
            (4, "qq rr s1 s2 s3 s4 s5"),
        ],
        "doc_id long, text string",
    )
    for tier in ("fold", "xxhash64"):
        out = {
            (r["id_a"], r["id_b"]): r
            for r in t.winnow_verified(
                docs, min_shared=1, hash_tier=tier
            ).collect()
        }
        assert set(out) == {(1, 2)}, tier
        r = out[(1, 2)]
        assert r["max_run_grams"] == 6 and r["max_run_tokens"] == 8
        assert r["n_matches"] == 6
    # candidates override: verify an explicit pair set, skip propose
    cand = spark.createDataFrame([(3, 4)], "id_a long, id_b long")
    got = t.winnow_verified(docs, candidates=cand, min_run_tokens=5).collect()
    assert len(got) == 1 and got[0]["max_run_tokens"] == 5
    # survivors compose downstream like every other family
    from bulkfhirloader_spark.operators import dedup as dd

    surv = dd.duplicate_clusters(t.winnow_verified(docs, min_shared=1))
    rows = surv.collect()
    assert len(rows) == 1
    assert rows[0]["keep_id"] == 1 and rows[0]["cluster_size"] == 2
