"""Property-based tests (SURVEY.md §5.5): transform invariants, merge
convergence, watermark clamp monotonicity/idempotence."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cdk_datalake_ingest_spark.dsl.compiler import (
    MAGIC_EPOCH_OFFSET,
    compile_transformation,
)
from cdk_datalake_ingest_spark.operators.merge import merge_dataframes
from cdk_datalake_ingest_spark.operators.watermark import clamp_future

_SLOW = dict(max_examples=6, deadline=None)
_FAST = dict(max_examples=200, deadline=None)

NOW = dt.datetime(2026, 8, 13, 12, 0, 0)
YESTERDAY_EOD = "2026-08-12 23:59:59"


@given(
    st.datetimes(
        min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 1, 1)
    )
)
@settings(**_FAST)
def test_clamp_future_bounded_and_idempotent(ts):
    v = ts.strftime("%Y-%m-%d %H:%M:%S")
    clamped = clamp_future(v, now=NOW)
    # never beyond yesterday end-of-day (the reference's rule,
    # UpdateLoadStartValue-MSSQL.py:170-176)
    assert clamped <= YESTERDAY_EOD
    # past values pass through; idempotent either way
    if v <= YESTERDAY_EOD:
        assert clamped == v
    assert clamp_future(clamped, now=NOW) == clamped


@given(st.integers(min_value=0, max_value=5_000_000))
@settings(**_SLOW)
def test_datemagic_decode_matches_validity_window(spark, n):
    """Any integer: decode iff it matches the reference's regex window
    (700000..3599999), else the declared default (SJ:263-277)."""
    df = spark.createDataFrame([(str(n),)], "day_num string")
    got = df.select(
        compile_transformation(
            "fn_transform_DateMagic(day_num,yyyy-MM-dd,1900-01-01)", "date"
        ).alias("d")
    ).first()["d"]
    if 700000 <= n <= 3599999:
        want = dt.date(1900, 1, 1) + dt.timedelta(days=n - MAGIC_EPOCH_OFFSET)
    else:
        want = dt.date(1900, 1, 1)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # key
            st.integers(min_value=0, max_value=100),  # version
            st.integers(min_value=-1000, max_value=1000),  # value
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SLOW)
def test_merge_is_idempotent_and_latest_wins(spark, rows):
    """Re-merging the same source is a no-op, and every key holds the
    max-version row (deterministic survivor under total order)."""
    data = [
        (k, v, val, i) for i, (k, v, val) in enumerate(rows)
    ]  # tiebreak idx makes survivor unambiguous
    df = spark.createDataFrame(data, "k int, ver int, val int, idx int")
    target = df.limit(0)
    once = merge_dataframes(target, df, ["k"], order_by=["ver", "idx"])
    twice = merge_dataframes(once, df, ["k"], order_by=["ver", "idx"])
    got_once = {(r.k, r.ver, r.val, r.idx) for r in once.collect()}
    got_twice = {(r.k, r.ver, r.val, r.idx) for r in twice.collect()}
    assert got_once == got_twice
    want = {}
    for k, ver, val, idx in data:
        if k not in want or (ver, idx) > (want[k][1], want[k][3]):
            want[k] = (k, ver, val, idx)
    assert got_once == set(want.values())


@given(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=30,
    ),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=10,
    ),
)
@settings(**_SLOW)
def test_concatenate_ws_arbitrary_columns(spark, a, b):
    df = spark.createDataFrame([(a, b)], "c1 string, c2 string")
    got = df.select(
        compile_transformation(
            "fn_transform_Concatenate_ws(c1,c2,-)", "string"
        ).alias("x")
    ).first()["x"]
    assert got == f"{a}-{b}"


# ---- range join: bucketed strategy == naive inequality join ------------

_pt = st.tuples(
    st.integers(min_value=0, max_value=3),      # key
    st.integers(min_value=-500, max_value=500),  # ts
)
_iv = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=-500, max_value=500),
    st.integers(min_value=0, max_value=200),     # span
)


@given(
    st.lists(_pt, min_size=1, max_size=25),
    st.lists(_iv, min_size=1, max_size=10),
    st.sampled_from([7, 50, 128, 1000]),
)
@settings(**_SLOW)
def test_range_join_equals_naive(spark, points, intervals, width):
    from cdk_datalake_ingest_spark.operators.range_join import range_join

    p = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)], "k int, ts long, pid int"
    )
    iv = spark.createDataFrame(
        [(k, lo, lo + span, i) for i, (k, lo, span) in enumerate(intervals)],
        "k int, lo long, hi long, iid int",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(p, iv, "ts", "lo", "hi", on=["k"], bucket_width=width).collect()
    }
    want = {
        (pid, iid)
        for (kp, t), pid in ((x, i) for i, x in enumerate(points))
        for (ki, lo, span), iid in ((x, i) for i, x in enumerate(intervals))
        if kp == ki and lo <= t <= lo + span
    }
    assert got == want


# ---- continuous rollup: incremental == full, any batch split -----------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),  # ts
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-5, max_value=5),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=999),  # split point
)
@settings(**_SLOW)
def test_rollup_incremental_equals_full_for_any_ordered_split(
    spark, tmp_path_factory, rows, split
):
    """Event-time-ordered arrival split at any point: refreshing batch1
    then all-rows equals one full refresh (the lateness contract only
    bites for out-of-order arrival beyond lookback, excluded here)."""
    from cdk_datalake_ingest_spark.operators.rollup import ContinuousRollup
    from cdk_datalake_ingest_spark.operators.watermark import WatermarkStore

    base = tmp_path_factory.mktemp("roll")

    def mk(name):
        return ContinuousRollup(
            spark,
            str(base / name),
            WatermarkStore(base / f"{name}.wm.json"),
            name=name,
            bucket_us=100,
            dims=["event_type"],
        )

    df = spark.createDataFrame(
        [(t, e, float(v)) for t, e, v in rows],
        "ts_us long, event_type string, value double",
    )
    inc, full = mk("inc"), mk("full")
    inc.refresh(df.filter(F.col("ts_us") < split))
    inc.refresh(df)
    full.refresh(df)
    snap = lambda r: {
        (x.bucket_us, x.event_type): (x.n, x.total_value)
        for x in r.read().collect()
    }
    assert snap(inc) == snap(full)


# ---- sharded-window equivalence (queries.py scale rewrites) -------------
#
# The sharded plans must be BYTE-IDENTICAL to the global-window formulas
# they replaced, for any shard width and any input. Hypothesis drives
# token sizes / hashes; the ground truth is the plain sequential
# computation in Python.


@given(
    nts=st.lists(st.integers(min_value=0, max_value=600), min_size=1, max_size=60),
    width=st.integers(min_value=1, max_value=20),
)
@settings(**_SLOW)
def test_sharded_pack_cumsum_equals_global(spark, nts, width):
    """floor(exclusive-cumsum/budget) computed per (lang, doc_id-range
    shard) + shard offsets == the single global per-lang cumsum."""
    from pyspark.sql import Row, Window

    spark = spark
    budget = 256
    rows = [
        Row(doc_id=i, lang="en" if i % 3 else "de", nt=nt)
        for i, nt in enumerate(nts)
    ]
    df = spark.createDataFrame(rows)
    sized = df.withColumn(
        "__shard", (F.col("doc_id") / F.lit(width)).cast("bigint")
    )
    w_in = Window.partitionBy("lang", "__shard").orderBy("doc_id")
    per = sized.withColumn("__cum_in", F.sum("nt").over(w_in))
    totals = sized.groupBy("lang", "__shard").agg(F.sum("nt").alias("__tot"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "lang", "__shard",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    got = {
        r["doc_id"]: r["pack_idx"]
        for r in per.join(offsets, ["lang", "__shard"]).withColumn(
            "pack_idx",
            F.floor(
                (F.col("__off") + F.col("__cum_in") - F.col("nt"))
                / F.lit(budget)
            ),
        ).collect()
    }
    # ground truth: sequential per-lang exclusive cumsum
    cum: dict = {}
    want = {}
    for r in rows:
        prev = cum.get(r.lang, 0)
        want[r.doc_id] = prev // budget
        cum[r.lang] = prev + r.nt
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=80),
)
@settings(**_SLOW)
def test_sharded_rank_equals_global_rank(spark, n):
    """Per-shard row_number + cumulative shard offsets == global
    row_number, when the shard is a prefix of the sort key."""
    from pyspark.sql import Row, Window

    spark = spark
    df = spark.createDataFrame(
        [Row(doc_id=i) for i in range(n)]
    ).withColumn("__h", F.md5(F.col("doc_id").cast("string"))).withColumn(
        "__shard", F.conv(F.substring("__h", 1, 2), 16, 10).cast("int")
    )
    ranked = df.withColumn(
        "__r", F.row_number().over(Window.partitionBy("__shard").orderBy("__h"))
    )
    counts = df.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__shard", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    got = {
        r["doc_id"]: r["pos"]
        for r in ranked.join(offsets, "__shard")
        .select("doc_id", (F.col("__off") + F.col("__r")).alias("pos"))
        .collect()
    }
    want_order = sorted(got, key=lambda d: __import__("hashlib").md5(str(d).encode()).hexdigest())
    want = {d: i + 1 for i, d in enumerate(want_order)}
    assert got == want


# ---------------------------------------------------------------------------
# Round 4: landing promotion + schedule invariants
# ---------------------------------------------------------------------------

_fname = st.text(
    alphabet=st.sampled_from("abcdefghij0123456789._-"), min_size=1, max_size=20
).filter(lambda s: s not in (".", "..") and not s.startswith((".", "_"))
         and "/" not in s)


@given(st.lists(_fname, min_size=1, max_size=8, unique=True))
@settings(max_examples=25, deadline=None)
def test_promote_preserves_count_uniqueness_extension(tmp_path_factory, names):
    """For any landing file set: promotion succeeds, moves exactly the
    source files, leaves the landing prefix empty, produces unique
    target names, and each target keeps the last extension of some
    source file (multiset-equal)."""
    import os

    from cdk_datalake_ingest_spark.operators.landing import PrefixStore, promote

    root = tmp_path_factory.mktemp("store")
    store = PrefixStore(str(root))
    src = root / "temp/derby/S/T1"
    src.mkdir(parents=True, exist_ok=True)
    for n in names:
        (src / n).write_bytes(b"x")
    clock = lambda: dt.datetime(2026, 8, 14, 5, 30)  # noqa: E731 — coarse on purpose
    out = promote(store, project="p", bd_type="derby", endpoint="e",
                  source_schema="S", source_table="t1", clock=clock)
    assert out["result"] == "SUCCESS"
    moved = store.list_prefix(out["target_path"])
    assert len(moved) == len(names)
    base = [k.split("/")[-1] for k in moved]
    assert len(set(base)) == len(names)  # coarse clock still yields unique names
    assert sorted(os.path.splitext(b)[1] for b in base) == sorted(
        os.path.splitext(n)[1] for n in names
    )
    assert store.list_prefix("temp/") == []


@given(
    st.integers(0, 59),
    st.integers(0, 23),
    st.datetimes(
        min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 1, 1)
    ),
)
@settings(max_examples=200, deadline=None)
def test_cron_next_fire_matches_and_is_minimal(minute, hour, after):
    """next_fire is strictly after the input, matches the pattern, and
    is the EARLIEST such minute (a daily (minute, hour) pattern fires
    within 24h, and no pattern-matching minute exists in between)."""
    from cdk_datalake_ingest_spark.plans.schedule import CronSchedule

    c = CronSchedule(minute=str(minute), hour=str(hour))
    nxt = c.next_fire(after)
    assert nxt > after
    assert (nxt.minute, nxt.hour) == (minute, hour)
    assert nxt - after <= dt.timedelta(days=1, minutes=1)
    prev_candidate = nxt - dt.timedelta(days=1)
    assert prev_candidate <= after  # nothing matching earlier was skipped


@given(
    st.integers(1, 48),
    st.integers(-10_000, 10_000),
)
@settings(max_examples=200, deadline=None)
def test_rate_next_fire_aligned_and_minimal(hours, offset_minutes):
    """Rate schedules fire on the anchor lattice: the result is the
    first anchor + k*interval strictly after the probe time."""
    from cdk_datalake_ingest_spark.plans.schedule import RateSchedule

    anchor = dt.datetime(2026, 1, 1, 0, 0)
    r = RateSchedule.hours(hours, anchor)
    after = anchor + dt.timedelta(minutes=offset_minutes)
    nxt = r.next_fire(after)
    assert nxt > after
    delta = nxt - anchor
    assert delta % r.interval == dt.timedelta(0) and delta >= dt.timedelta(0)
    if after < anchor:
        # rules never fire before creation: the first fire IS the anchor
        assert nxt == anchor
    else:
        assert nxt - r.interval <= after  # minimal on the lattice


@given(
    st.lists(
        st.integers(min_value=0, max_value=200),  # doc token counts
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=1, max_value=40),  # size
    st.integers(min_value=1, max_value=40),  # stride (clamped <= size)
)
@settings(**_SLOW)
def test_chunking_matches_python_reference(spark, lens, size, stride):
    """chunk_documents equals the plain-Python sliding-window reference
    for arbitrary (doc length, size, stride <= size): same chunk
    count, same chunk text, full coverage. (stride > size is rejected
    by the operator — found by an earlier draft of this test: a gap
    between windows can place a start past a short document's end.)"""
    from cdk_datalake_ingest_spark.operators.corpus import chunk_documents

    stride = min(stride, size)

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(n)))
         for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, size=size, stride=stride).collect()
    }
    expected = {}
    for i, n in enumerate(lens):
        toks = [f"w{i}x{j}" for j in range(n)]
        if n == 0:
            continue
        n_chunks = 1 + max(0, -(-(n - size) // stride)) if n > size else 1
        for c in range(n_chunks):
            piece = toks[c * stride : c * stride + size]
            expected[(i, c)] = (len(piece), " ".join(piece))
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SLOW)
def test_unigram_lm_matches_python_reference(spark, token_lists):
    """bits_per_token equals the plain-Python smoothed unigram LM for
    arbitrary small corpora (single-char tokens, so normalization is
    the identity)."""
    import math
    from collections import Counter

    from cdk_datalake_ingest_spark.operators.corpus import unigram_lm_scores

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in unigram_lm_scores(docs, alpha=0.5).collect()
    }
    counts = Counter(t for toks in token_lists for t in toks)
    n_total, v_size = sum(counts.values()), len(counts)
    expected = {}
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        bits = [
            -math.log2((counts[t] + 0.5) / (n_total + 0.5 * v_size))
            for t in toks
        ]
        expected[i] = (len(toks), round(sum(bits) / len(bits), 6))
    assert set(got) == set(expected)
    for i, (n, b) in expected.items():
        assert got[i][0] == n
        assert abs(got[i][1] - b) < 2e-6, (i, got[i], b)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=12,
        unique_by=tuple,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(**_SLOW)
def test_kmeans_assignment_is_argmin(spark, vecs, k):
    """Every vector's final cluster minimizes the rounded distance to
    the final centroids (ties toward the smaller cid) — the assignment
    really is the argmin of what lloyd_kmeans returns."""
    from cdk_datalake_ingest_spark.operators.semantic import lloyd_kmeans

    k = min(k, len(vecs))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    assigned, cents = lloyd_kmeans(df, k=k, iters=2, dim=4)
    emb = {r["vec_id"]: r for r in df.collect()}
    for row in assigned.collect():
        v = [float(x) for x in emb[row["vec_id"]]["embedding"]]
        dists = [
            (round(sum((a - b) * (a - b) for a, b in zip(v, c)), 6), i + 1)
            for i, c in enumerate(cents)
        ]
        best = min(dists)
        assert row["cluster_id"] == best[1], (row, dists)
        assert row["dist"] == best[0]


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SLOW)
def test_dedup_substrings_matches_python_reference(spark, token_lists):
    """dedup_substrings == a direct Python implementation of the
    first-occurrence-survives contract on random tiny-vocabulary
    corpora (high window-collision rate by construction)."""
    from cdk_datalake_ingest_spark.operators.corpus import dedup_substrings

    L = 3
    docs = [(i, " ".join(ts)) for i, ts in enumerate(token_lists)]
    # python reference: min (doc, pos) occurrence of each duplicated
    # window survives; all other occurrences' token spans are deleted
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, ts in enumerate(token_lists):
        for p in range(len(ts) - L + 1):
            occ.setdefault(" ".join(ts[p : p + L]), []).append((d, p))
    covered: dict[int, set[int]] = {d: set() for d, _ in enumerate(token_lists)}
    for spans in occ.values():
        if len(spans) >= 2:
            keep = min(spans)
            for d, p in spans:
                if (d, p) != keep:
                    covered[d].update(range(p, p + L))
    expect = {}
    for d, ts in enumerate(token_lists):
        kept = [t for i, t in enumerate(ts) if i not in covered[d]]
        expect[d] = (" ".join(kept), len(ts) - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in dedup_substrings(df, length=L).collect()
    }
    assert got == expect


@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=10
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SLOW)
def test_incremental_near_dup_equals_batch_restriction(spark, token_lists):
    """Ingesting a batch against the persisted corpus index finds
    EXACTLY the pairs the batch operator finds over the union,
    restricted to (batch, existing) — same ids, same jaccard values.
    The crawl-ingest contract: dedup each snapshot against everything
    already kept without re-shingling the corpus, losing nothing vs a
    full re-run. Random tiny-vocabulary corpora make band collisions
    and real near-dups common; odd ids form the batch."""
    from cdk_datalake_ingest_spark.operators.dedup import (
        incremental_near_dup,
        minhash_near_dup_pairs,
        minhash_signature_index,
    )

    docs = [(i, " ".join(ts)) for i, ts in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    existing = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)

    t = 0.3
    bands, sets = minhash_signature_index(existing, "doc_id", "text")
    incr = {
        (r["new_id"], r["dup_of"]): r["jaccard"]
        for r in incremental_near_dup(
            batch, bands, sets, "doc_id", "text", jaccard_threshold=t
        ).collect()
    }
    full = {}
    for r in minhash_near_dup_pairs(
        df, "doc_id", "text", jaccard_threshold=t
    ).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 2 != b % 2:  # one existing, one batch
            new_id, dup_of = (a, b) if a % 2 == 1 else (b, a)
            full[(new_id, dup_of)] = r["jaccard"]
    assert incr == full


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            st.one_of(
                st.none(),
                st.floats(
                    allow_nan=False, allow_infinity=False,
                    min_value=-1e6, max_value=1e6,
                ),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_zorder_rewrite_preserves_content_for_any_frame(
    spark, tmp_path_factory, rows
):
    """optimize(zorder=True) is a pure layout rewrite: for ANY frame
    (NULLs, duplicates, constant columns included) the multiset of
    rows after the rewrite equals the input exactly."""
    from cdk_datalake_ingest_spark.operators.table import ManagedTable

    df = spark.createDataFrame(
        [(i, x, v) for i, (x, v) in enumerate(rows)],
        "id long, x long, v double",
    )
    t = ManagedTable(
        spark, tmp_path_factory.mktemp("zprop") / "t"
    )
    t.write(df)
    t.optimize(["x", "v"], num_files=3, zorder=True)
    got = sorted(tuple(r) for r in t.read().collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
