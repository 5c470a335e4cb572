"""Property-style invariants (SURVEY §5.2.3).

The cross-engine primitives (hash60, tokens, shingles, quantized cosine)
underpin every oracle comparison — Hypothesis hammers their pure-Python /
DuckDB twins per-example, and one batched Spark job per primitive checks
the Spark side against the same inputs (batched because a Spark job per
Hypothesis example would take minutes).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduceproject_spark.functions.hashing import duck_hash60, hash60
from mapreduceproject_spark.functions.textfn import (
    duck_tokens,
    duck_word_shingles,
    tokens,
    word_shingles,
)

# printable-ish text without backslashes/quotes so the same literal can be
# embedded in DuckDB SQL; the Spark side gets values via a DataFrame so it
# has no quoting constraint
_sql_safe_text = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126, exclude_characters="'\\\""
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_sql_safe_text)
def test_hash60_duck_twin_matches_python(s):
    """duck_hash60 == int(md5[:15], 16) — the exact definition hash60
    implements in Spark; and the value fits 60 bits."""
    import hashlib

    expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    got = duckdb.sql(f"SELECT {duck_hash60(repr(s))} AS h").fetchone()[0]
    assert got == expected
    assert 0 <= got < 1 << 60


@settings(max_examples=200, deadline=None)
@given(_sql_safe_text)
def test_tokens_duck_twin_matches_python(s):
    expected = s.split()
    got = duckdb.sql(f"SELECT {duck_tokens(repr(s))} AS t").fetchone()[0]
    assert list(got) == expected


@settings(max_examples=100, deadline=None)
@given(_sql_safe_text, st.integers(min_value=2, max_value=4))
def test_shingle_count_invariant(s, k):
    """len(shingles) == max(1, n_tokens - k + 1) for non-empty token lists
    (short docs collapse to a single whole-text shingle)."""
    toks = s.split()
    got = duckdb.sql(f"SELECT {duck_word_shingles(repr(s), k)} AS sh").fetchone()[0]
    if len(toks) >= k:
        assert len(got) == len(toks) - k + 1
        assert got[0] == " ".join(toks[:k])
    else:
        assert list(got) == [" ".join(toks)]


def test_spark_twins_match_duckdb_on_random_batch(spark):
    """One batched cross-engine check: Spark's hash60/tokens/shingles over
    200 Hypothesis-ish random strings equal the DuckDB twins."""
    import random
    import string

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "     .,-!?"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(200)
    ] + ["", " ", "one", "a  b   c"]

    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    spark_rows = (
        df.select(
            "s",
            hash60(F.col("s")).alias("h"),
            tokens(F.col("s")).alias("t"),
            word_shingles(F.col("s"), 3).alias("sh"),
        )
        .collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE x (s VARCHAR)")
    con.executemany("INSERT INTO x VALUES (?)", [(s,) for s in samples])
    duck = {
        r[0]: (r[1], list(r[2]), list(r[3]))
        for r in con.execute(
            f"SELECT s, {duck_hash60('s')}, {duck_tokens('s')}, {duck_word_shingles('s', 3)} FROM x"
        ).fetchall()
    }
    for r in spark_rows:
        dh, dt, dsh = duck[r["s"]]
        assert r["h"] == dh, r["s"]
        assert list(r["t"]) == dt, r["s"]
        assert list(r["sh"]) == dsh, r["s"]


def test_quantized_cosine_self_is_one(spark):
    from mapreduceproject_spark.functions.vectors import quantized_cosine

    df = spark.createDataFrame(
        [([0.25, -1.5, 3.125, 0.0078125],)], "v array<double>"
    )
    got = df.select(quantized_cosine(F.col("v"), F.col("v")).alias("c")).first()["c"]
    assert got == pytest.approx(1.0, abs=1e-12)


def test_row_explode_helpers_match_array_versions(spark):
    """char_ngram_rows / word_shingle_rows are performance rewrites of
    explode(char_ngrams) / explode(word_shingles) — same rows, per id,
    including position numbering and short/empty-document edge rules."""
    import random
    import string

    from mapreduceproject_spark.functions.textfn import (
        char_ngram_rows,
        char_ngrams,
        word_shingle_rows,
        word_shingles,
    )

    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + "     .,-!?"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 80)))
        for _ in range(200)
    ] + ["", " ", "ab", "one", "a  b   c"]
    df = spark.createDataFrame(list(enumerate(samples)), ["i", "s"])

    old_g = df.select(
        "i", F.posexplode(char_ngrams(F.lower(F.col("s")), 3)).alias("pos", "g")
    )
    new_g = char_ngram_rows(df, F.lower(F.col("s")), 3, keep=["i"], pos_col="pos")
    assert old_g.exceptAll(new_g).count() == 0
    assert new_g.exceptAll(old_g).count() == 0

    old_sh = df.select("i", F.explode(word_shingles(F.col("s"), 3)).alias("sh"))
    new_sh = word_shingle_rows(df, F.col("s"), 3, keep=["i"])
    assert old_sh.exceptAll(new_sh).count() == 0
    assert new_sh.exceptAll(old_sh).count() == 0


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
)
def test_sliding_window_indices_cover_exactly(n, window, stride):
    """Pure-Python twin of the sliding_token_windows index math: starts
    are 0, stride, 2·stride, ... < n; every token position is covered by
    >= 1 window when stride <= window; window lengths are min(window,
    n - start).  The Spark operator's sequence/slice expressions encode
    exactly this — tests/test_pipeline_extras.py pins the Spark side."""
    starts = list(range(0, n, stride))
    if n == 0:
        assert starts == []
        return
    lengths = [min(window, n - s) for s in starts]
    assert all(1 <= ln <= window for ln in lengths)
    assert starts[-1] + lengths[-1] == min(n, starts[-1] + window)
    if stride <= window:
        covered = set()
        for s, ln in zip(starts, lengths):
            covered.update(range(s, s + ln))
        assert covered == set(range(n))


def test_simhash_band_extract_matches_python(spark):
    """_band_extract's straddling-band bit arithmetic vs a pure-Python
    reference over random 64-bit signatures and every band layout used
    by the lossless-knob range (5..13 bands): each band must reproduce
    bits [start, start+width) of hi<<32|lo exactly."""
    import random

    from mapreduceproject_spark.operators.dedup import SIMHASH_BITS, _band_extract

    rnd = random.Random(11)
    rows = [
        (i, rnd.getrandbits(32), rnd.getrandbits(32)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "i long, sig_lo long, sig_hi long")
    for nb in (5, 7, 8, 13):
        widths = [
            SIMHASH_BITS // nb + (1 if j < SIMHASH_BITS % nb else 0)
            for j in range(nb)
        ]
        starts = [sum(widths[:j]) for j in range(nb)]
        cols = [
            _band_extract(starts[b], widths[b]).alias(f"b{b}") for b in range(nb)
        ]
        got = {r["i"]: [r[f"b{b}"] for b in range(nb)] for r in df.select("i", *cols).collect()}
        for i, lo, hi in rows:
            full = (hi << 32) | lo
            want = [
                (full >> starts[b]) & ((1 << widths[b]) - 1) for b in range(nb)
            ]
            assert got[i] == want, f"nb={nb} i={i}"


def test_twolevel_assignment_matches_brute_when_exhaustive(spark, sf_dir):
    """assign="twolevel" with coarse_nprobe >= ceil(sqrt(C)) probes every
    coarse cell, so its candidate set is every centroid and the ranked
    assignment must equal brute EXACTLY — the lossless-mode guarantee of
    the coarse-quantized assignment (operators/similarity.py), and the
    condition the default coarse_nprobe=4 satisfies for C <= 16."""
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators.similarity import (
        _quantized_side,
        assign_cells,
        resolve_centroid_filter,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cq = _quantized_side(emb, "vec_id", "embedding", "id")
    for c in (16, 64):
        pick = resolve_centroid_filter(cq, F.col("id"), c)
        cents = pick(cq).select(
            F.col("id").alias("cid"),
            F.col("_q").alias("cq"),
            F.col("_n2").alias("cn2"),
        )
        brute = {
            (r["id"], r["cid"], r["rn"])
            for r in assign_cells(cq, cents, "id", nprobe=2, assign="brute").collect()
        }
        tl = {
            (r["id"], r["cid"], r["rn"])
            for r in assign_cells(
                cq, cents, "id", nprobe=2, assign="twolevel", coarse_nprobe=8
            ).collect()
        }
        assert tl == brute, f"C={c}: exhaustive twolevel diverged from brute"


def test_kmeans_twolevel_assignment_matches_brute_small_n(spark, sf_dir):
    """kmeans assign="twolevel" at k=16 (coarse = ceil(sqrt(16)) = 4 <=
    default coarse_nprobe) must return the identical clustering as brute
    assignment — the small-n equality contract for the corpus-scaled
    assignment path."""
    from mapreduceproject_spark.operators.clustering import kmeans_quantized

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kb = {
        tuple(r)
        for r in kmeans_quantized(
            spark, emb, "vec_id", "embedding", k=16, iterations=2
        ).collect()
    }
    kt = {
        tuple(r)
        for r in kmeans_quantized(
            spark, emb, "vec_id", "embedding", k=16, iterations=2, assign="twolevel"
        ).collect()
    }
    assert kb == kt and kb


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_zorder_interleave_roundtrip(a, b):
    """The Morton key must be a BIJECTION on (int31, int31): deinterleave
    recovers both keys exactly for the full key range (the 16-bit-era
    aliasing bug made distant keys collide — this pins the current
    width), and the key fits the signed-long budget.  Width comes from
    layout.ZORDER_BITS so this test and the operator cannot drift."""
    from mapreduceproject_spark.operators.layout import ZORDER_BITS

    from tests.test_quality_layout import morton_ref

    z = morton_ref(a, b)
    assert 0 <= z < 1 << (2 * ZORDER_BITS)
    ra = sum(((z >> (2 * i)) & 1) << i for i in range(ZORDER_BITS))
    rb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(ZORDER_BITS))
    assert (ra, rb) == (a, b)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
    ),
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=24
    ),
    st.integers(min_value=2, max_value=5),
)
def test_repeated_ngram_mask_matches_python_reference(toks1, toks2, k):
    """Coverage math vs a brute-force Python reference on random 2-doc
    corpora (all k-gram occurrence counting, any-alignment coverage,
    intra-doc repeats).  Collected per-example, executed as ONE Spark
    job in the batch test below via module-level accumulation."""
    docs = {1: toks1, 2: toks2}
    grams: dict[str, int] = {}
    for ts in docs.values():
        for j in range(len(ts) - k + 1):
            g = " ".join(ts[j : j + k])
            grams[g] = grams.get(g, 0) + 1
    expect = {}
    for did, ts in docs.items():
        covered = set()
        for j in range(len(ts) - k + 1):
            if grams[" ".join(ts[j : j + k])] >= 2:
                covered.update(range(j, j + k))
        expect[did] = (len(ts), len(covered))
    _MASK_CASES.append((toks1, toks2, k, expect))


_MASK_CASES: list = []


def test_repeated_ngram_mask_spark_batch(spark):
    """Run the accumulated Hypothesis mask cases through the real Spark
    operator — one job for all examples (a distinct doc-id space per
    case so corpora don't cross-contaminate the gram counts requires
    per-case runs; instead sample a bounded subset)."""
    from mapreduceproject_spark.operators.dedup import (
        repeated_ngram_mask_profile,
    )

    cases = _MASK_CASES[:12] if _MASK_CASES else [
        (["a", "b", "a", "b"], ["a", "b"], 2,
         {1: (4, 4), 2: (2, 2)})
    ]
    for toks1, toks2, k, expect in cases:
        df = spark.createDataFrame(
            [(1, " ".join(toks1)), (2, " ".join(toks2))], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_masked"])
            for r in repeated_ngram_mask_profile(df, "doc_id", "text", k=k).collect()
        }
        assert got == expect, (toks1, toks2, k)


# -- round-4 review: degenerate-input guards in shared function helpers ------


def test_ols_degenerate_group_yields_null_not_crash(spark):
    """A constant-x (or single-row) group has zero x variance: slope/r2
    must be NULL on both engines — Spark ANSI would otherwise raise
    DIVIDE_BY_ZERO and kill the whole grouped regression."""
    import duckdb

    from mapreduceproject_spark.functions import stats as st

    df = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3)], "x long, y long"
    )
    row = df.agg(*st.ols_sum_aggs()).select(
        st.ols_outputs()[0].alias("slope_q"),
        st.ols_outputs()[2].alias("r2"),
    ).first()
    assert row["slope_q"] is None and row["r2"] is None
    d = duckdb.sql(
        f"SELECT {st.DUCK_OLS_SLOPE_Q} AS s, {st.DUCK_OLS_R2} AS r FROM "
        + st.duck_ols_sums("(VALUES (5, 1), (5, 2), (5, 3)) t(x, y)")
    ).fetchone()
    assert d == (None, None)


def test_zero_vector_cosine_is_null_not_crash(spark):
    """An all-zero vector has no direction: every cosine form must yield
    NULL on both engines instead of an ANSI DIVIDE_BY_ZERO abort."""
    import duckdb

    from pyspark.sql import functions as F2

    from mapreduceproject_spark.functions import vectors as vx

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        vx.quantized_cosine(F2.col("a"), F2.col("b")).alias("qc"),
        vx.cosine_similarity(F2.col("a"), F2.col("b")).alias("cs"),
    ).first()
    assert row["qc"] is None and row["cs"] is None
    q = vx.duck_quantize("[0.0, 0.0]")
    p = vx.duck_quantize("[1.0, 2.0]")
    assert duckdb.sql(
        f"SELECT {vx.duck_quantized_cosine(q, p)} AS c"
    ).fetchone()[0] is None
    # ragged lengths: Spark NULL-poisons; the duck twin's CASE matches
    assert duckdb.sql(
        f"SELECT {vx.duck_quantized_cosine(vx.duck_quantize('[1.0]'), p)} AS c"
    ).fetchone()[0] is None


def test_null_text_tokenizes_to_empty_on_both_engines(spark):
    """NULL text must tokenize to an EMPTY array on both engines so a
    NULL-text document shingles/buckets identically instead of dropping
    from Spark joins while the oracle keeps it."""
    import duckdb

    from pyspark.sql import functions as F2

    from mapreduceproject_spark.functions import textfn as tf

    df = spark.createDataFrame([(1, None)], "id long, text string")
    got = df.select(F2.size(tf.tokens(F2.col("text"))).alias("n")).first()["n"]
    assert got == 0
    assert duckdb.sql(
        f"SELECT len({tf.duck_tokens('NULL')}) AS n"
    ).fetchone()[0] == 0
    sh = df.select(tf.word_shingles(F2.col("text")).alias("s")).first()["s"]
    assert sh == [""]
    assert duckdb.sql(
        f"SELECT {tf.duck_word_shingles('CAST(NULL AS VARCHAR)')} AS s"
    ).fetchone()[0] == [""]


def test_skyline_null_x_rows_never_suppress_frontier(spark):
    """A NULL-x row sorts LAST (DuckDB's default, now Spark's too) so its
    y can never mask genuine frontier rows."""
    from mapreduceproject_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(1, 1.0, 5.0), (2, 2.0, 8.0), (3, None, 100.0)],
        "id long, x double, y double",
    )
    ids = {r["id"] for r in skyline_2d(df, "x", "y", ["id"]).collect()}
    assert {1, 2} <= ids, "NULL-x row suppressed the real frontier"


def test_gopher_stopwords_match_case_blind(spark):
    """Sentence-initial capitalized stopwords must count as hits — the
    published Gopher rule lowercases before matching."""
    from mapreduceproject_spark.operators.quality import gopher_doc_flags
    from mapreduceproject_spark.operators.text_analysis import STOPWORDS

    text = "The Report And The Data " + "word " * 60
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = gopher_doc_flags(df, "doc_id", "text", STOPWORDS).first()
    assert row["stop_hits"] >= 2
    assert row["fail_stopwords"] is False


def test_multimodal_null_text_flows_as_empty_payload(spark):
    """A NULL-text row must flow through the Arrow kernels as an empty
    payload (deterministic on both engines), not TypeError the query."""
    import hashlib

    from mapreduceproject_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "abc"), (2, None)], "doc_id long, text string"
    )
    p = mm.attach_binary_payload(df, "doc_id", "text")
    rows = {r["doc_id"]: r for r in mm.decode_stats(p, "doc_id").collect()}
    assert rows[2]["n_bytes"] == 0
    assert rows[2]["content_md5"] == hashlib.md5(b"").hexdigest()


def test_parity_survives_non_utc_bare_session(spark, sf_dir):
    """The driver harness builds a bare session whose timezone defaults to
    the JVM's local zone: load_table must re-pin UTC (runtime conf) or
    every epoch/timestamp conversion shifts while the DuckDB oracle stays
    timezone-naive."""
    from mapreduceproject_spark.oracle import check_query

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        assert check_query(spark, "table_checksums", sf_dir).ok
        assert check_query(spark, "customer_rfm", sf_dir).ok
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_array_functions_empty_doc_yields_nulls(spark, tmp_path):
    """A zero-token document must produce NULL first/last tokens (F.get),
    not an ANSI INVALID_ARRAY_INDEX crash from element_at."""
    import duckdb

    from mapreduceproject_spark.plans import QUERIES, ORACLES

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "b a the"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in QUERIES["array_functions"](spark, d).collect()}
    assert rows[1]["first_tok"] == "a" and rows[1]["last_tok"] == "the"
    assert rows[2]["first_tok"] is None and rows[2]["n_unique"] == 0
    assert rows[3]["last_tok"] is None and rows[3]["has_the"] is False
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{d}/documents.parquet/*.parquet')"
    )
    orc = {r[0]: r for r in con.execute(ORACLES["array_functions"]).fetchall()}
    assert orc[2][1] == 0 and orc[2][2] is None and orc[3][4] is False


def test_json_numeric_parse_discipline(spark):
    """Junk JSON values parse to NULL (not an ANSI cast error / DuckDB
    Conversion Error) and decimals truncate toward zero on both engines."""
    import duckdb

    from pyspark.sql import functions as F2

    vals = ["7", "3.5", "-3.5", "junk", None]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = [
        r["v"]
        for r in df.select(
            F2.col("s").try_cast("double").cast("long").alias("v")
        ).collect()
    ]
    assert got == [7, 3, -3, None, None]
    duck = [
        duckdb.sql(
            f"SELECT CAST(trunc(TRY_CAST({'NULL' if v is None else v!r} AS DOUBLE)) AS BIGINT)"
        ).fetchone()[0]
        for v in vals
    ]
    assert duck == got


def test_rollup_gid_is_long(spark, sf_dir):
    """gid must be bigint on both engines — numpy 2 reprs int32 and int64
    differently, which would break the driver-style value hash."""
    from pyspark.sql.types import LongType

    from mapreduceproject_spark.plans import QUERIES

    for name in ("agg_rollup", "agg_cube"):
        schema = QUERIES[name](spark, sf_dir).schema
        assert isinstance(schema["gid"].dataType, LongType), name


def test_approx_percentile_rank_flag_tie_safe(spark, tmp_path):
    """All-duplicate values: the sketch's answer occupies a rank interval
    spanning the whole group — the flag must still be TRUE (the old
    single-point distance check failed exactly here)."""
    from mapreduceproject_spark.plans import QUERIES

    d = str(tmp_path)
    spark.createDataFrame(
        [("click", 5.0)] * 1000, "event_type string, value double"
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    row = QUERIES["agg_approx_percentile"](spark, d).first()
    assert row["within_rank_bound"] is True and row["p50_exact"] == 5.0


def test_whitespace_class_agrees_across_all_three_dialects(spark):
    """Java \\s includes \\x0B; RE2's does not; Python str.split() is
    Unicode-whitespace — the explicit WS_CHARS class must make the Spark
    tokenizer, the DuckDB twin, and the wordcount mapper agree on VT and
    NBSP text."""
    import duckdb

    from mapreduceproject_spark.functions.textfn import duck_tokens, tokens
    from mapreduceproject_spark.operators.mapreduce import wordcount_mapper

    cases = {
        "foo\x0bbar": ["foo", "bar"],      # VT: Java-only under \s
        "foo\xa0bar": ["foo\xa0bar"],      # NBSP: Python-only whitespace
        "a\tb\nc d": ["a", "b", "c", "d"],
    }
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {
        r["s"]: list(r["t"])
        for r in df.select("s", tokens(F.col("s")).alias("t")).collect()
    }
    con = duckdb.connect()
    for s, expect in cases.items():
        assert got[s] == expect, repr(s)
        # control chars via chr() concatenation: DuckDB standard strings
        # do not process backslash escapes
        lit = "'" + s.replace("\x0b", "' || chr(11) || '").replace(
            "\xa0", "' || chr(160) || '"
        ).replace("\t", "' || chr(9) || '").replace(
            "\n", "' || chr(10) || '"
        ) + "'"
        d = con.execute(f"SELECT {duck_tokens(f'({lit})')}").fetchone()[0]
        assert list(d) == expect, repr(s)
        assert [w for w, _ in wordcount_mapper(s)] == expect, repr(s)


def test_grep_pattern_dialect_agreement(spark):
    """[^\\n] reads identically in Java and RE2 where '.' does not: a
    carriage return between the anchors must match on BOTH engines."""
    import duckdb

    from mapreduceproject_spark.plans.mapreduce_queries import GREP_PATTERN

    texts = ["scan\rxx join", "scan then join", "scan\nthen join", "nope"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = {
        r["t"]: r["m"]
        for r in df.select(
            "t", F.col("t").rlike(GREP_PATTERN).alias("m")
        ).collect()
    }
    con = duckdb.connect()
    for t in texts:
        lit = t.replace("\r", "' || chr(13) || '").replace(
            "\n", "' || chr(10) || '"
        )
        d = con.execute(
            f"SELECT regexp_matches('{lit}', '{GREP_PATTERN}')"
        ).fetchone()[0]
        assert d == got[t], repr(t)
    assert got["scan\rxx join"] is True and got["scan\nthen join"] is False


def test_store_cli_rejects_missing_operands(tmp_path):
    """store verbs with missing positionals must exit with a usage error,
    not a raw traceback."""
    from mapreduceproject_spark.__main__ import main

    root = str(tmp_path / "root")
    assert main(["store", root, "get", "onlyone"]) == 2
    assert main(["store", root, "ls"]) == 2
    assert main(["store", root, "store"]) == 0


def test_auto_centroid_policy_piecewise_and_in_plan_agreement(spark):
    """The 'auto' centroid policy is piecewise — linear to the n=4e6 knee,
    sqrt(n) above it, hard-capped at 65536 — and the driver-side mirror
    (auto_centroid_count) must agree exactly with the in-plan cutoff
    resolve_centroid_filter computes, at every regime."""
    import math

    import pyspark.sql.functions as F

    from mapreduceproject_spark.operators.similarity import (
        AUTO_MAX_CENTROIDS,
        auto_centroid_count,
        resolve_centroid_filter,
    )

    # driver-side shape
    assert auto_centroid_count(100) == 16  # floor
    assert auto_centroid_count(4_000) == 32  # linear region: n/125
    assert auto_centroid_count(4_000_000) == 32_000  # knee: both curves meet
    assert auto_centroid_count(5_000_000) == 16 * math.floor(
        math.sqrt(5_000_000)
    )  # sqrt region < n/125 = 40_000
    assert auto_centroid_count(20_000_000) == AUTO_MAX_CENTROIDS  # capped
    assert auto_centroid_count(10**9) == AUTO_MAX_CENTROIDS  # stays capped
    # monotone non-decreasing across regimes
    pts = [10, 2_000, 4_000_000, 4_100_000, 16_900_000, 10**8]
    vals = [auto_centroid_count(n) for n in pts]
    assert vals == sorted(vals)

    # in-plan cutoff == driver mirror (spark.range is O(1) data: count only)
    for n in (4_000, 5_000_000, 20_000_000):
        big = spark.range(n).select(F.col("id"))
        pick = resolve_centroid_filter(big, F.col("id"), "auto")
        assert pick(big).count() == min(auto_centroid_count(n), n), n


def test_kmeans_distributed_centroids_match_literal_path(spark, sf_dir):
    """Above max_literal_centroids the Lloyd loop keeps centroids as a
    distributed localCheckpoint'd frame instead of driver literals; both
    paths run identical arithmetic, so assignments must be identical
    (the round-4 verdict's driver-payload contract)."""
    from mapreduceproject_spark.operators.clustering import kmeans_quantized

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lit_path = sorted(
        map(tuple, kmeans_quantized(spark, emb, "vec_id", "embedding", k=16).collect())
    )
    dist_path = sorted(
        map(
            tuple,
            kmeans_quantized(
                spark, emb, "vec_id", "embedding", k=16, max_literal_centroids=0
            ).collect(),
        )
    )
    assert lit_path == dist_path and lit_path
