"""Property-based checks (SURVEY §5.2) — invariants under arbitrary data."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import money_sum, split_hierarchy
from airflow_retail_etl_spark.operators.dedup import jaccard_pairs

cents = st.integers(min_value=0, max_value=10_000_000)

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: for properties whose single example runs several Spark jobs (iterated
#: upserts, windowed packing) — fewer, smaller examples
HEAVY = settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(st.lists(cents, min_size=1, max_size=50))
def test_money_sum_is_partitioning_invariant(spark, values):
    rows = [(c / 100.0,) for c in values]
    df = spark.createDataFrame(rows, ["v"])
    one = df.coalesce(1).agg(money_sum(F.col("v")).alias("s")).first()["s"]
    many = (
        df.repartition(7).agg(money_sum(F.col("v")).alias("s")).first()["s"]
    )
    exact = sum(values) / 100.0
    assert one == many == exact


@SLOW
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=4),
        min_size=0,
        max_size=5,
    )
)
def test_split_hierarchy_reconstructs(spark, parts):
    code = ".".join(parts) if parts else None
    df = spark.createDataFrame([(code,)], "category_code string")
    c1, c2, c3 = split_hierarchy(F.col("category_code"))
    got = df.select(c1.alias("a"), c2.alias("b"), c3.alias("c")).first()
    expected = (parts + ["na", "na", "na"])[:3] if parts else ["na"] * 3
    assert [got["a"], got["b"], got["c"]] == expected


@SLOW
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=3, max_size=30),
        min_size=2,
        max_size=6,
        unique=True,
    )
)
def test_jaccard_bounds_and_identity(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts) if t.strip()]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in jaccard_pairs(df, "text", "doc_id").collect():
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]


@HEAVY
@given(
    st.lists(
        st.integers(min_value=0, max_value=40),  # chunk token counts
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=32),  # max_tokens
)
def test_packing_covers_stream_exactly(spark, counts, max_tokens):
    """Chop packing: addresses are a gapless re-layout of the token stream."""
    from airflow_retail_etl_spark.operators.packing import pack_chunks

    df = spark.createDataFrame(
        [(1, i, n) for i, n in enumerate(counts)],
        ["doc_id", "chunk_id", "n_chunk_tokens"],
    )
    rows = sorted(
        pack_chunks(df, max_tokens=max_tokens, n_buckets=1).collect(),
        key=lambda r: r.chunk_id,
    )
    offset = 0
    for r in rows:
        assert r.seq_id == offset // max_tokens
        assert r.seq_offset == offset % max_tokens
        spans = (offset + max(r.n_tokens - 1, 0)) // max_tokens > r.seq_id
        assert r.spans_boundary == spans
        offset += r.n_tokens


@HEAVY
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.sampled_from(["a", "b", None]),        # attr (NULLs included)
            st.integers(min_value=0, max_value=3),    # day
        ),
        min_size=1,
        max_size=10,
    )
)
def test_scd2_fold_equals_rebuild_on_random_histories(spark, raw):
    """scd2_upsert folded day-by-day == scd2_from_snapshots, any history."""
    import datetime as dt
    from collections import Counter

    from airflow_retail_etl_spark.operators.scd import (
        scd2_from_snapshots,
        scd2_upsert,
    )

    # one snapshot row per (key, day): last write wins deterministically
    snap = {}
    for key, attr, day in raw:
        snap[(key, day)] = attr
    rows = [
        (k, v, dt.date(2020, 1, d + 1)) for (k, d), v in snap.items()
    ]
    snaps = spark.createDataFrame(rows, "k long, a string, d date")
    full = scd2_from_snapshots(snaps, ["k"], ["a"], "d")

    days = sorted({r[2] for r in rows})
    hist = (
        snaps.filter(F.col("d") == days[0])
        .select(
            "k",
            "a",
            F.col("d").alias("effective_from"),
            F.lit(None).cast("date").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
    )
    for day in days[1:]:
        batch = snaps.filter(F.col("d") == day).drop("d")
        hist = scd2_upsert(hist, batch, ["k"], ["a"], F.lit(day))
    assert Counter(map(tuple, hist.collect())) == Counter(
        map(tuple, full.collect())
    )


@HEAVY
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=5),
)
def test_exact_k_sampling_sizes_and_stability(spark, keys, k):
    from airflow_retail_etl_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame([(x, x % 3) for x in set(keys)], ["key", "s"])
    out = sample_exact_k(df, ["s"], k, "key")
    sizes = {
        r.s: r.n
        for r in out.groupBy("s").count().withColumnRenamed("count", "n").collect()
    }
    full = {
        r.s: r.n
        for r in df.groupBy("s").count().withColumnRenamed("count", "n").collect()
    }
    for stratum, n in sizes.items():
        assert n == min(k, full[stratum])
    again = sample_exact_k(df.repartition(5), ["s"], k, "key")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


@HEAVY
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=2,
        max_size=5,
    )
)
def test_shared_spans_match_bruteforce_on_random_text(spark, texts):
    """shared_span_pairs ≡ the brute-force diagonal method on arbitrary
    small-alphabet strings (maximally repetitive — the hardest case for
    run/island bookkeeping)."""
    from tests.test_shared_spans import _reference_spans

    from airflow_retail_etl_spark.operators.dedup import shared_span_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in shared_span_pairs(
            df, "text", "doc_id", k=3, min_len=5
        ).collect()
    }
    assert got == _reference_spans(docs, k=3, min_len=5)


@HEAVY
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),
            st.integers(min_value=1, max_value=8),
        ),
        min_size=0,
        max_size=6,
    )
)
def test_remove_spans_equals_python_interval_surgery(spark, intervals):
    from airflow_retail_etl_spark.operators.dedup import remove_spans

    text = "abcdefghijklmnopqrstuvwxyz"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(0, 1, 0, s, ln) for s, ln in intervals],
        "id_a long, id_b long, start_a int, start_b int, span_len int",
    )
    r = remove_spans(df, spans, "text", "doc_id").first()
    keep = [True] * len(text)
    for s, ln in intervals:
        for p in range(s - 1, min(s - 1 + ln, len(text))):
            keep[p] = False
    expected = "".join(c for c, k in zip(text, keep) if k)
    assert r["text_clean"] == expected
    assert r["n_removed_chars"] == len(text) - len(expected)


def _ref_shingles(text: str) -> frozenset:
    """Mirror _with_shingles(kind='token', n=3): normalize → whitespace
    tokens → distinct 3-gram windows; concat_ws skips past-end NULLs."""
    import re as _re

    t = _re.sub(r"\s+", " ", text).strip().lower()
    toks = t.split(" ") if t else []
    count = max(len(toks) - 2, 1)
    return frozenset(
        " ".join(toks[i:i + 3]) for i in range(count)
    )


@HEAVY
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(["a", "b", "c", " "]),
            min_size=0, max_size=24,
        ),
        min_size=1, max_size=4,
    ),
    st.lists(
        st.text(
            alphabet=st.sampled_from(["a", "b", "c", " "]),
            min_size=0, max_size=24,
        ),
        min_size=1, max_size=4,
    ),
)
def test_incremental_dedup_matches_declarative_rule(spark, ex_texts, in_texts):
    """incremental_dedup ≡ the documented rule, brute-forced in python:
    an incoming doc drops iff it near-dups (token-3-gram Jaccard ≥ 0.5)
    any existing doc or a smaller-id incoming doc."""
    from airflow_retail_etl_spark.operators.dedup import incremental_dedup

    existing = [(i, t) for i, t in enumerate(ex_texts)]
    incoming = [(100 + i, t) for i, t in enumerate(in_texts)]
    sh = {i: _ref_shingles(t) for i, t in existing + incoming}

    def jac(a, b):
        u = len(sh[a] | sh[b])
        return len(sh[a] & sh[b]) / u if u else 0.0

    expected = []
    for i, _ in incoming:
        dup = any(jac(i, j) >= 0.5 for j, _ in existing) or any(
            jac(i, j) >= 0.5 for j, _ in incoming if j < i
        )
        if not dup:
            expected.append(i)

    got = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            spark.createDataFrame(existing, "doc_id long, text string"),
            spark.createDataFrame(incoming, "doc_id long, text string"),
            "text",
            "doc_id",
            min_jaccard=0.5,
        ).collect()
    )
    assert got == sorted(expected)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@HEAVY
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=2,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_edit_distance_pairs_complete_on_random_corpora(spark, texts, k):
    """PassJoin blocking completeness fuzz: tiny alphabet ('a','b',space)
    maximizes near-collisions, whitespace exercises normalization, and
    short strings hit the tiny-string block and empty-segment edges."""
    import re

    from airflow_retail_etl_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs(
            df, "text", "doc_id", max_dist=k, max_bucket_size=None
        ).collect()
    )
    norm = [re.sub(r"\s+", " ", t.strip().lower())[:80] for t in texts]
    want = sorted(
        (i, j, _lev(norm[i], norm[j]))
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _lev(norm[i], norm[j]) <= k
    )
    assert got == want


@SLOW
@given(
    st.lists(
        st.text(min_size=0, max_size=12),
        min_size=1,
        max_size=40,
    )
)
def test_cms_overestimate_guarantee_on_arbitrary_strings(spark, values):
    """CMS est ≥ exact count for EVERY key, under arbitrary unicode
    (marker chars, quotes, emoji, empties) and a width tiny enough that
    collisions are the norm — the lossless-prune invariant
    heavy_hitters() rests on."""
    from collections import Counter

    from airflow_retail_etl_spark.operators import frequency

    exact = Counter(values)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    cms = frequency.cms_build(df, "v", width=4, depth=2)
    probed = frequency.cms_probe(
        df.distinct(), "v", cms, width=4, depth=2
    ).collect()
    assert len(probed) == len(exact)
    for r in probed:
        assert r.cms_est >= exact[r.v], (r.v, r.cms_est, exact[r.v])


@SLOW
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.text(min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_grouped_cms_prune_is_lossless_per_group(spark, pairs):
    """heavy_hitters_by == the naive per-group exact filter, under
    arbitrary unicode values and a width where collisions are the norm
    — the grouped lossless-prune invariant."""
    from collections import Counter

    from airflow_retail_etl_spark.operators import frequency

    exact = Counter(pairs)
    df = spark.createDataFrame(pairs, "g string, v string")
    got = {
        (r.g, r.value): r.n_exact
        for r in frequency.heavy_hitters_by(
            df, "v", "g", threshold=2, width=4, depth=2
        ).collect()
    }
    want = {gv: n for gv, n in exact.items() if n >= 2}
    assert got == want


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                      # day index
            st.sampled_from(["view", "cart", "purchase", "other"]),
            st.integers(-1000, 100000),             # price in cents
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 5),                              # number of splits
)
def test_kpi_cell_fold_law_on_random_events(spark, rows, n_splits):
    """mart_state's linear fold law under random data and random
    batching: cells built from ANY disjoint split of the events, union
    folded, equal the one-shot grain aggregate — and the fold is
    grouping-path independent (fold(day grain) ≡ direct total)."""
    import datetime

    from airflow_retail_etl_spark.operators import mart_state

    data = [
        (
            i,
            datetime.date(2024, 1, 1 + d),
            t,
            c / 100.0,
        )
        for i, (d, t, c) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, event_date date, event_type string, price double"
    )
    one_shot = mart_state.kpi_fold(mart_state.kpi_cells(df, []), [])
    parts = [
        mart_state.kpi_cells(df.filter(F.col("event_id") % n_splits == i), [])
        for i in range(n_splits)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    refolded = mart_state.kpi_fold(u, [])
    a, b = one_shot.first(), refolded.first()
    assert tuple(a) == tuple(b)
    exp_purch = sum(1 for d, t, c in rows if t == "purchase")
    exp_rev = sum(c for d, t, c in rows if t == "purchase") / 100.0
    assert a["purchases"] == exp_purch
    assert float(a["revenue_cents"]) == exp_rev


@HEAVY
@given(
    st.lists(
        st.tuples(st.integers(0, 20), cents), min_size=1, max_size=30
    ),
    st.integers(2, 4),
)
def test_moment_cell_fold_law_on_random_values(spark, rows, n_splits):
    """moment_fold over ANY batch split equals the one-shot cells —
    the linear fold law for (n, Σx, Σx²) state on arbitrary values."""
    from airflow_retail_etl_spark.operators import mart_state

    df = spark.createDataFrame(
        [
            (f"2024-01-{(d % 9) + 1:02d}", c / 100.0, i)
            for i, (d, c) in enumerate(rows)
        ],
        "event_date string, price double, k long",
    ).withColumn("event_date", F.to_date("event_date"))
    one = mart_state.moment_cells(df, [], "price")
    parts = [
        mart_state.moment_cells(
            df.filter(F.col("k") % n_splits == i), [], "price"
        )
        for i in range(n_splits)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    folded = mart_state.moment_fold(u, ["event_date"])
    key = lambda r: str(r["event_date"])  # noqa: E731
    assert sorted(map(tuple, folded.collect()), key=lambda t: str(t[0])) == \
        sorted(map(tuple, one.collect()), key=lambda t: str(t[0]))


@HEAVY
@given(
    st.lists(st.tuples(st.integers(0, 12), cents), min_size=1, max_size=25),
    st.sampled_from([0.5, 0.9, 0.99]),
)
# Round-14 falsifying example: at lam=0.5 the Horner accumulator hits the
# exact dyadic half 0.9790625, where Spark AND DuckDB round half away from
# zero (0.979063) while builtin round() is banker's (0.979062). The golden
# below must therefore be Decimal ROUND_HALF_UP, never Python round().
@example(rows=[(1, 4), (2, 1), (2, 55), (0, 0), (8, 97)], lam=0.5)
def test_decayed_read_equals_python_horner(spark, rows, lam):
    """decayed_read on arbitrary per-day revenue equals a python Horner
    fold over the dense calendar (gap days contribute 0)."""
    import datetime as dt

    from airflow_retail_etl_spark.operators import mart_state

    df = spark.createDataFrame(
        [
            (f"2024-02-{(d % 13) + 1:02d}", "purchase", c / 100.0)
            for d, c in rows
        ],
        "event_date string, event_type string, price double",
    ).withColumn("event_date", F.to_date("event_date"))
    cells = mart_state.kpi_cells(df, [])
    got = {
        str(r["event_date"]): r["decayed"]
        for r in mart_state.decayed_read(
            cells, "revenue_cents", lam=lam
        ).collect()
    }
    per_day = {
        str(r["event_date"]): float(r["revenue_cents"])
        for r in cells.collect()
    }
    days = sorted(per_day)
    lo = dt.date.fromisoformat(days[0])
    hi = dt.date.fromisoformat(days[-1])
    # Golden rounding is HALF_UP, the repo's publication policy (Spark's
    # F.round and DuckDB's ROUND both round half away from zero); builtin
    # round() is banker's and disagrees at exact dyadic halves (lam=0.5).
    import decimal

    def round6_half_up(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    acc, cur = 0.0, lo
    expect = {}
    while cur <= hi:
        acc = acc * lam + per_day.get(str(cur), 0.0)
        expect[str(cur)] = round6_half_up(acc)
        cur += dt.timedelta(days=1)
    assert got == {d: expect[d] for d in got}


@HEAVY
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.booleans()),
        min_size=4,
        max_size=60,
    ).filter(
        lambda rs: any(b for _, b in rs) and any(not b for _, b in rs)
    ),
    st.integers(2, 4),
)
def test_freq_shift_is_replication_invariant(spark, rows, r):
    """Heavy-change law: replicating every row r× scales all counts and
    totals by r, so shares — and therefore the ranking, the directions
    and the published shifts — are unchanged."""
    from airflow_retail_etl_spark.operators.profile import freq_shift

    base = spark.createDataFrame(
        [(f"k{k}", b) for k, b in rows], "key string, b boolean"
    )
    rep = spark.createDataFrame(
        [(f"k{k}", b) for k, b in rows for _ in range(r)],
        "key string, b boolean",
    )
    one = freq_shift(base, "key", F.col("b"), k=50).select(
        "key", "shift", "direction"
    ).collect()
    many = freq_shift(rep, "key", F.col("b"), k=50).select(
        "key", "shift", "direction"
    ).collect()
    assert one == many


@HEAVY
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", categories=("L", "N", "Zs")
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_fim_reconstructs_on_random_text(spark, texts):
    """FIM law on arbitrary text: applied rows always reassemble to the
    normalized input (prefix+middle+suffix, lens sum to L, ends
    non-empty); pass-through rows return the normalized text verbatim."""
    import re

    from airflow_retail_etl_spark.operators.chunking import fim_transform

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    for row in fim_transform(df, rate=1.0, min_chars=2).collect():
        norm = re.sub(r"\s+", " ", texts[row["doc_id"]]).strip().lower()
        if not row["fim_applied"]:
            assert row["fim_text"] == norm and len(norm) < 2
            continue
        t = row["fim_text"]
        assert t.startswith("<pre>")
        pre, rest = t[5:].split("<suf>", 1)
        suf, mid = rest.split("<mid>", 1)
        assert pre + mid + suf == norm
        assert (row["prefix_len"], row["middle_len"], row["suffix_len"]) == (
            len(pre), len(mid), len(suf),
        )
        assert len(pre) >= 1 and len(suf) >= 1
