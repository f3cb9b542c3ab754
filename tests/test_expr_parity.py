"""Tree-parity pins for the r16 one-``F.expr``-parse builders.

The r16 optimization round rebuilt several static expression builders as
single SQL-text parses (one py4j round trip) instead of dozens-to-hundreds
of Column-API calls (guide §4, driver-side work).  The contract of every
conversion is that the PARSED TREE is identical to the old Column form —
``sameSemantics`` (canonicalized logical-plan equality) proves executed
plans and therefore results cannot differ.  These tests pin each
conversion against an inline reconstruction of the pre-r16 Column form,
so any future drift in either the SQL text or the Column helpers that
would change semantics fails loudly here instead of at the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bulkfhirloader_spark.functions.binding import let
from bulkfhirloader_spark.operators.dedup import (
    MERSENNE_PRIME,
    _permutation_constants,
    band_hash_array,
    minhash_sig_expr,
)
from bulkfhirloader_spark.operators.text import (
    STOPWORDS,
    language_pred_exprs,
    quality_exprs,
    tokens,
)


@pytest.fixture(scope="module")
def sig_df(spark):
    """Two-row frame with minhash-signature-shaped array<bigint> columns."""
    return spark.createDataFrame(
        [(1, list(range(128)), list(range(128)))],
        "id long, minhash array<bigint>, mh_b array<bigint>",
    )


def test_band_hash_array_str_form_matches_column_form(sig_df):
    bands, num_hashes = 8, 128
    new = sig_df.select(band_hash_array("minhash", bands, num_hashes).alias("b"))
    old = sig_df.select(
        band_hash_array(F.col("minhash"), bands, num_hashes).alias("b")
    )
    assert new.sameSemantics(old)


def test_jaccard_estimate_expr_matches_column_fold(sig_df):
    num_hashes = 128
    df = sig_df.select(F.col("minhash").alias("mh_a"), "mh_b")
    # pre-r16 Column form from minhash_near_dup_pairs
    est_old = F.aggregate(
        F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_hashes))
    # the r16 one-parse form (kept in sync with minhash_near_dup_pairs)
    est_new = F.expr(
        "aggregate(zip_with(mh_a, mh_b, (x, y) -> CAST((x = y) AS INT)), "
        f"0, (acc, x) -> acc + x) / {float(num_hashes)!r}D"
    )
    assert df.select(est_new.alias("j")).sameSemantics(
        df.select(est_old.alias("j"))
    )


def _quality_exprs_column_form(text_col: str = "text") -> dict:
    """The pre-r16 Column-API body of text.quality_exprs, verbatim."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = let(
        en_stop,
        lambda stop: F.size(
            F.filter(toks, lambda t: F.array_contains(stop, F.lower(t)))
        ),
    )
    safe_tokens = F.nullif(n_tokens, F.lit(0)).cast("double")
    safe_chars = F.nullif(n_chars, F.lit(0)).cast("double")
    return {
        "n_tokens": n_tokens,
        "n_chars_computed": n_chars,
        "avg_token_len": n_chars.cast("double") / safe_tokens,
        "alpha_ratio": n_alpha.cast("double") / safe_chars,
        "punct_ratio": n_punct.cast("double") / safe_chars,
        "stopword_ratio": n_stop.cast("double") / safe_tokens,
    }


def test_minhash_sig_expr_matches_column_constant_form(spark):
    num_hashes = 32
    df = spark.createDataFrame(
        [(1, ["a b c", "b c d"])], "id long, sh array<string>"
    )
    new = df.select(minhash_sig_expr(F.col("sh"), num_hashes).alias("m"))
    # pre-r16 Column-loop constant arrays
    consts = _permutation_constants(num_hashes)
    a_vec = F.array(*[F.lit(a).cast("long") for a, _b in consts])
    b_vec = F.array(*[F.lit(b).cast("long") for _a, b in consts])
    init = F.array(*[F.lit(MERSENNE_PRIME).cast("long")] * num_hashes)
    hx = F.transform(
        F.col("sh"), lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32))
    )
    old_expr = F.aggregate(
        hx,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(
                a_vec,
                b_vec,
                lambda a, b: F.pmod(h * a + b, F.lit(MERSENNE_PRIME)),
            ),
            lambda cur, cand: F.least(cur, cand),
        ),
    )
    assert new.sameSemantics(df.select(old_expr.alias("m")))


def _language_pred_exprs_column_form(text_col: str = "text") -> dict:
    """The pre-r16 Column-API body of text.language_pred_exprs, verbatim."""
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    scores = []
    for lang, words in STOPWORDS.items():
        wl = F.array(*[F.lit(w) for w in words])
        hits = let(
            wl,
            lambda stop: F.size(
                F.filter(toks, lambda t: F.array_contains(stop, t))
            ),
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return {
        "lang_pred": F.when(best["hits"] > 0, best["lang"]).otherwise(
            F.lit("und")
        ),
        "stopword_hits": best["hits"],
    }


def test_language_pred_exprs_match_column_form(spark):
    """VALUE parity (not sameSemantics) against the archived pre-r16
    Column form: the r16-batch-3 tree intentionally differs — the token
    array is let-bound once around the whole expression (the old form
    re-ran the regexp tokenization per language inside each filter), the
    argmax struct is bound once around the CASE (the old form evaluated
    it twice — HOF-bearing trees get no subexpression elimination), and
    the per-token stopword test is a literal IN (InSet).  Values must be
    identical on every adversarial input, including NULL/empty/unicode/
    tie-breaking multi-language rows."""
    docs = _adversarial_docs(spark)
    new_exprs = language_pred_exprs("text")
    old_exprs = _language_pred_exprs_column_form("text")
    assert set(new_exprs) == set(old_exprs)
    sel = docs.select(
        "doc_id",
        *[new_exprs[n].alias(f"n_{n}") for n in new_exprs],
        *[old_exprs[n].alias(f"o_{n}") for n in new_exprs],
    ).collect()
    for r in sel:
        for n in new_exprs:
            got, want = r[f"n_{n}"], r[f"o_{n}"]
            assert (got is None and want is None) or got == want, (
                f"language expr {n} value drift on doc {r.doc_id}: "
                f"{got!r} != {want!r}"
            )


def test_chunk_documents_matches_column_form(spark):
    from bulkfhirloader_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "")], "doc_id long, text string"
    )
    chunk_tokens, stride = 3, 2

    # pre-r16 Column-API chunking tree, verbatim
    def _chunks(toks):
        n = F.size(toks)
        n_starts = F.when(
            n > 0, F.ceil(n / F.lit(stride)).cast("int")
        ).otherwise(0)
        starts = F.sequence(F.lit(0), F.greatest(n_starts - 1, F.lit(0)))
        return F.when(
            n > 0,
            F.transform(
                starts, lambda i: F.slice(toks, i * stride + 1, chunk_tokens)
            ),
        ).otherwise(F.array().cast("array<array<string>>"))

    chunks_old = let(tokens(F.col("text")), _chunks)
    exploded_old = docs.select(
        F.col("doc_id"), F.posexplode(chunks_old).alias("chunk_idx", "chunk_toks")
    )
    old = exploded_old.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.col("chunk_toks")).alias("chunk_text"),
        F.size("chunk_toks").cast("long").alias("n_chunk_tokens"),
    )
    new = chunk_documents(
        docs, chunk_tokens=chunk_tokens, stride=stride
    )
    assert new.sameSemantics(old)


def test_simhash_signatures_match_column_constant_form(spark):
    from bulkfhirloader_spark.operators.dedup import simhash_signatures
    from bulkfhirloader_spark.operators.dedup import ensure_parallelism
    from bulkfhirloader_spark.operators.text import normalize_text

    bits = 64
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    new = simhash_signatures(docs, bits=bits)
    # pre-r16 Column-loop constant arrays, function body otherwise verbatim
    ht = F.transform(
        tokens(normalize_text(F.col("text"))), lambda t: F.xxhash64(t)
    )
    d = (
        ensure_parallelism(docs)
        .select(F.col("doc_id"), ht.alias("ht"))
        .filter(F.size("ht") > 0)
    )
    idx = F.array(*[F.lit(i) for i in range(bits)])
    zeros = F.array(*[F.lit(0).cast("long")] * bits)
    ones = F.aggregate(
        "ht",
        zeros,
        lambda acc, h: F.zip_with(
            acc, idx, lambda a, i: a + F.getbit(h, i).cast("long")
        ),
    )
    bitvals = F.array(
        *[
            F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
            for i in range(bits)
        ]
    )
    n = F.size("ht").cast("long")
    sig = F.aggregate(
        F.zip_with(
            ones,
            bitvals,
            lambda c, bv: F.when(c * 2 > n, bv).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    old = d.select(F.col("doc_id"), sig.alias("simhash"))
    assert new.sameSemantics(old)


def test_table_buckets_str_form_matches_column_form(spark):
    from bulkfhirloader_spark.operators.similarity import (
        _table_buckets,
        lsh_tables,
    )

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)])], "id long, embedding array<double>"
    )
    tables = lsh_tables(dim=8, n_planes=4, n_tables=2)
    new = df.select(_table_buckets("embedding", tables).alias("b"))
    old = df.select(_table_buckets(F.col("embedding"), tables).alias("b"))
    assert new.sameSemantics(old)


ADVERSARIAL_TEXTS = [
    "", " ", None, "the", "THE", "the the the", "theory el la", "el",
    "unde und", "the.\tel\nla die", "  der und  ", "y a la le",
    "das el the le la die y und", "the\xa0el", "ThE eL", "où le",
    "İ the", "a" * 4096 + " the el la", "the, and. a; of! el?", "..." ,
    "l'eau et le vin", "die der das den", "él el", "ß und",
]


def _adversarial_docs(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL_TEXTS)],
        "doc_id long, text string",
    )


def test_quality_exprs_match_column_form(spark):
    """Tree pins for the entries whose r16 one-parse form is
    node-identical to the Column form; VALUE pin for stopword_ratio,
    whose r16-batch-3 form intentionally differs (IN-list InSet probe
    instead of let-bound array + array_contains — HOF lambdas run
    interpreted, so the per-token membership test is the projection's
    hot loop)."""
    docs = _adversarial_docs(spark)
    new_exprs = quality_exprs("text")
    old_exprs = _quality_exprs_column_form("text")
    assert set(new_exprs) == set(old_exprs)
    for name in new_exprs:
        if name == "stopword_ratio":
            continue
        assert docs.select(new_exprs[name].alias("v")).sameSemantics(
            docs.select(old_exprs[name].alias("v"))
        ), f"quality expr {name} drifted from the Column form"
    got = docs.select(
        "doc_id",
        new_exprs["stopword_ratio"].alias("n"),
        old_exprs["stopword_ratio"].alias("o"),
    ).collect()
    for r in got:
        assert (r.n is None and r.o is None) or r.n == r.o, (
            f"stopword_ratio value drift on doc {r.doc_id}: {r.n} != {r.o}"
        )
