"""Property-based tests (hypothesis) — the upgrade over the reference's
example-only test strategy (SURVEY §5)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from evolution_data_warehouse_spark.functions.naming import ascii_fold, normalize_name
from evolution_data_warehouse_spark.operators.scd import scd2_apply

# ---------------------------------------------------------------------------
# pure-python function properties (fast, many examples)
# ---------------------------------------------------------------------------


@given(st.text(max_size=60))
def test_normalize_name_idempotent_and_clean(name):
    out = normalize_name(name)
    assert normalize_name(out) == out  # idempotent
    assert re.fullmatch(r"[a-z0-9_]*", out)  # snake_case ascii only
    assert not out.startswith("_") and not out.endswith("_")


@given(st.text(max_size=60))
def test_ascii_fold_strips_combining_marks(s):
    out = ascii_fold(s)
    import unicodedata

    assert not any(unicodedata.combining(ch) for ch in out)
    # folding is idempotent
    assert ascii_fold(out) == out


@given(st.text(alphabet="éèêàçöüÉnoabc-", min_size=1, max_size=20))
def test_ascii_fold_preserves_length_for_precomposed(s):
    # NFKD then dropping marks never lengthens the printable text
    assert len(ascii_fold(s)) <= len(s) * 2


# ---------------------------------------------------------------------------
# SCD2 invariants over generated snapshots (few examples — Spark jobs)
# ---------------------------------------------------------------------------

_keys = st.sampled_from(["k1", "k2", "k3", "k4", "k5"])
_vals = st.sampled_from(["a", "b", "c"])
_snapshot = st.dictionaries(_keys, _vals, min_size=0, max_size=5)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(current_map=_snapshot, staged_map=_snapshot)
def test_scd2_invariants(spark, current_map, staged_map):
    ts = F.lit("2025-01-01 00:00:00").cast("timestamp")
    current_rows = [
        (k, v, 1, True, None, None) for k, v in sorted(current_map.items())
    ]
    schema = (
        "k string, attr string, version int, est_actif boolean, "
        "date_debut_validite timestamp, date_fin_validite timestamp"
    )
    current = spark.createDataFrame(current_rows, schema=schema)
    staged = spark.createDataFrame(
        sorted(staged_map.items()) or [("__none__", "x")], schema="k string, attr string"
    ).filter(F.col("k") != "__none__")

    out = scd2_apply(current, staged, "k", ["attr"], ts).collect()

    # Invariant 1: at most one active row per key, and every key that was
    # ever seen has exactly one active row.
    active = [r for r in out if r.est_actif]
    assert len({r.k for r in active}) == len(active)
    seen_keys = set(current_map) | set(staged_map)
    assert {r.k for r in active} == seen_keys

    # Invariant 2: active rows carry the staged value when staged, else
    # the current value.
    for r in active:
        expected = staged_map.get(r.k, current_map.get(r.k))
        assert r.attr == expected

    # Invariant 3: no rows are lost — closed rows keep their old value.
    closed = [r for r in out if not r.est_actif]
    for r in closed:
        assert r.k in current_map and r.attr == current_map[r.k]
        assert r.date_fin_validite is not None

    # Invariant 4: versions are 1 or 2 here (single merge), new versions
    # only for changed keys.
    changed = {
        k for k in set(current_map) & set(staged_map)
        if current_map[k] != staged_map[k]
    }
    assert {r.k for r in out if r.version == 2} == changed


_rekeys = st.dictionaries(
    _keys,
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["n1", "n2", "n3"])),  # new_key
        st.one_of(st.none(), _vals),  # new_attr (None → carry old)
    ),
    min_size=0,
    max_size=3,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(current_map=_snapshot, rekey_map=_rekeys)
def test_scd2_rekey_invariants(spark, current_map, rekey_map):
    from evolution_data_warehouse_spark.operators.scd import scd2_rekey_apply

    ts = F.lit("2025-06-01 00:00:00").cast("timestamp")
    current_rows = [
        (k, v, 1, True, None, None) for k, v in sorted(current_map.items())
    ]
    schema = (
        "k string, attr string, version int, est_actif boolean, "
        "date_debut_validite timestamp, date_fin_validite timestamp"
    )
    current = spark.createDataFrame(current_rows, schema=schema)
    mapping_rows = [
        (k, nk, na) for k, (nk, na) in sorted(rekey_map.items())
    ] or [("__none__", None, None)]
    mapping = spark.createDataFrame(
        mapping_rows, schema="old_key string, new_key string, new_attr string"
    ).filter(F.col("old_key") != "__none__")

    out = scd2_rekey_apply(current, mapping, "k", ["attr"], ts).collect()

    hit = set(current_map) & set(rekey_map)

    # Closed-and-succeeded in one batch: each hit key has exactly one
    # closed row (old value, stamped end) and one successor at version 2
    # under coalesce(new_key, old_key) carrying coalesce(new_attr, old).
    closed = {r.k: r for r in out if not r.est_actif}
    assert set(closed) == hit
    for k in hit:
        assert closed[k].attr == current_map[k]
        assert closed[k].date_fin_validite is not None
    # Multiset compare: two old keys may legitimately fuse into the
    # same successor key (that IS the commune-fusion case).
    successors = sorted(
        (r.k, r.attr) for r in out if r.version == 2
    )
    expected_succ = sorted(
        ((rekey_map[k][0] or k), (rekey_map[k][1] or current_map[k]))
        for k in hit
    )
    assert successors == expected_succ
    assert all(r.est_actif for r in out if r.version == 2)

    # Row conservation: untouched + closed + successors.
    assert len(out) == len(current_map) + len(hit)

    # Mapping rows for unknown keys change nothing.
    untouched = [r for r in out if r.est_actif and r.version == 1]
    for r in untouched:
        assert current_map[r.k] == r.attr and r.k not in hit


# ---------------------------------------------------------------------------
# datapipe invariants over generated corpora (few examples — Spark jobs)
# ---------------------------------------------------------------------------

_token_counts = st.lists(
    st.integers(min_value=1, max_value=200), min_size=1, max_size=40
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=_token_counts)
def test_pack_contiguous_matches_sequential_model(spark, counts):
    # The distributed packer must equal the obvious sequential model:
    # per shard, walk docs in id order accumulating tokens; each doc's
    # bin is cum_before // capacity.
    from evolution_data_warehouse_spark.operators.datapipe import (
        PACK_CAPACITY,
        PACK_SHARDS,
        pack_contiguous,
    )
    from evolution_data_warehouse_spark.operators.dedup import content_hash64

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    got = {
        r.doc_id: (r.shard, r.bin_id, r.bin_pos)
        for r in pack_contiguous(df).collect()
    }

    shard_of = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id",
            (content_hash64(F.col("doc_id").cast("string")) % PACK_SHARDS).alias("s"),
        ).collect()
    }
    cum: dict[int, int] = {}
    for doc_id, c in rows:  # already in doc_id order
        s = shard_of[doc_id]
        before = cum.get(s, 0)
        expect = (s, (s << 40) + before // PACK_CAPACITY, before % PACK_CAPACITY)
        assert got[doc_id] == expect, f"doc {doc_id}: {got[doc_id]} != {expect}"
        cum[s] = before + c


_doc_tokens = st.lists(
    st.lists(
        st.text(alphabet="abcdefgé0", min_size=0, max_size=5),
        min_size=1,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_doc_tokens)
def test_chunk_fixed_tokens_spans_and_pack_roundtrip(spark, docs):
    # chunk_overlap_spans' operator: (1) chunk starts walk the doc at
    # stride steps, cover every token, and never produce a chunk
    # contained in its predecessor; (2) the char span sliced out of the
    # ORIGINAL text is exactly the chunk's tokens re-joined (the
    # provenance contract retrieval depends on); (3) the chunks feed
    # pack_contiguous unchanged (chunk -> pack round trip) with token
    # totals conserved up to the declared overlap.
    from evolution_data_warehouse_spark.operators.datapipe import (
        CHUNK_OVERLAP,
        CHUNK_SIZE,
        chunk_fixed_tokens,
        pack_contiguous,
    )

    stride = CHUNK_SIZE - CHUNK_OVERLAP
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_fixed_tokens(df).collect()

    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {i for i, _ in rows}

    for doc_id, text in rows:
        toks = text.split(" ")
        n = len(toks)
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        # model: starts at stride multiples, trailing start only if it
        # adds tokens beyond the previous chunk's coverage
        expect_starts = [
            s
            for s in range(0, n, stride)
            if s == 0 or s < n - CHUNK_OVERLAP
        ]
        assert [c.tok_start for c in chunks] == expect_starts
        assert chunks[-1].tok_end == n - 1  # full coverage
        for c in chunks:
            assert c.tok_end == min(c.tok_start + CHUNK_SIZE, n) - 1
            assert c.n_chunk_tokens == c.tok_end - c.tok_start + 1
            # provenance: the char span slices the original text to
            # exactly the chunk's tokens
            assert text[c.char_start:c.char_end] == " ".join(
                toks[c.tok_start : c.tok_end + 1]
            )
        # consecutive chunks overlap by exactly CHUNK_OVERLAP tokens
        # (less only at the trailing chunk)
        for a, b in zip(chunks, chunks[1:]):
            assert b.tok_start == a.tok_start + stride
            assert b.tok_start <= a.tok_end + 1  # no coverage gap

    # chunk -> pack round trip: every chunk packs, token totals conserved
    chunk_docs = [
        (r.doc_id * 10_000 + r.chunk_idx, int(r.n_chunk_tokens)) for r in out
    ]
    cdf = spark.createDataFrame(chunk_docs, "doc_id long, n_tokens int")
    packed = pack_contiguous(cdf).collect()
    assert len(packed) == len(out)
    assert all(p.bin_id is not None and p.bin_pos >= 0 for p in packed)
    total_packed = sum(p.n_tokens for p in packed)
    for doc_id, text in rows:
        n = len(text.split(" "))
        k = len(by_doc[doc_id])
        total_packed -= n + CHUNK_OVERLAP * (k - 1)
    assert total_packed == 0  # conservation up to declared overlap


_gap_minutes = st.lists(
    st.integers(min_value=0, max_value=120), min_size=1, max_size=40
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=90), min_size=2, max_size=24
    ),
    split=st.lists(st.integers(min_value=0, max_value=2), min_size=24, max_size=24),
)
def test_session_interval_coalesce_is_split_invariant(spark, gaps, split):
    # streaming_session_ingest's merge claim: sessionizing arbitrary
    # event subsets and coalescing the resulting intervals (running-max
    # end, 30-min gap) equals sessionizing ALL events at once — for ANY
    # 3-way split, including time-interleaved ones.
    import datetime as dt

    from evolution_data_warehouse_spark.streaming.incremental import (
        coalesce_session_intervals,
        sessionize_events,
    )

    base = dt.datetime(2024, 1, 1)
    ts, cur = [], base
    for g in gaps:
        cur = cur + dt.timedelta(minutes=g)
        ts.append(cur)
    rows = [(1, i, t) for i, t in enumerate(ts)]

    schema = "user_id long, event_id long, ts timestamp"
    full = sessionize_events(spark.createDataFrame(rows, schema))
    parts = [
        [r for i, r in enumerate(rows) if split[i] == b] for b in range(3)
    ]
    merged = None
    for part in parts:
        if not part:
            continue
        ps = sessionize_events(spark.createDataFrame(part, schema))
        merged = (
            ps
            if merged is None
            else coalesce_session_intervals(merged.unionByName(ps))
        )
    got = sorted(
        (r.session_start, r.session_end, r.n_events) for r in merged.collect()
    )
    want = sorted(
        (r.session_start, r.session_end, r.n_events) for r in full.collect()
    )
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(gaps=_gap_minutes)
def test_sessionization_matches_sequential_model(spark, gaps):
    # view_session_durations' gap-and-island construction must equal
    # the obvious sequential model: walk a user's events in time
    # order, open a new session when the gap exceeds 30 minutes.
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    base = dt.datetime(2024, 1, 1)
    ts = []
    cur = base
    for g in gaps:
        cur = cur + dt.timedelta(minutes=g)
        ts.append(cur)
    rows = [(1, i, t) for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )

    gap_us = 30 * 60 * 1_000_000
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(F.unix_micros("ts")).over(w_ord)
    new_sess = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    s = df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    got = (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
            F.count("*").alias("n"),
        )
        .orderBy("session_seq")
        .collect()
    )

    # sequential model
    sessions = []
    for i, t in enumerate(ts):
        if i == 0 or (t - ts[i - 1]) > dt.timedelta(minutes=30):
            sessions.append([t, t, 1])
        else:
            sessions[-1][1] = t
            sessions[-1][2] += 1
    assert len(got) == len(sessions)
    for r, (t0, t1, n) in zip(got, sessions):
        assert (r.t0, r.t1, r.n) == (t0, t1, n)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True))
def test_hash_split_respects_cuts_and_total(spark, ids):
    from evolution_data_warehouse_spark.operators.datapipe import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = hash_split(df).collect()
    assert len(out) == len(ids)
    for r in out:
        assert 0 <= r.bucket < 100
        expect = "train" if r.bucket < 90 else ("val" if r.bucket < 95 else "test")
        assert r.split == expect


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_fpq_matches_duckdb_mirror(spark, vals):
    # common.py::fpq and fpq_sql are the two halves of one contract:
    # identical fixed-point quantization on arbitrary doubles, so
    # ulp-sensitive interpolated results compare exactly across engines.
    import duckdb

    from evolution_data_warehouse_spark.queries.common import fpq, fpq_sql

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.q for r in df.select(fpq("x").alias("q")).collect()]

    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {fpq_sql('CAST(? AS DOUBLE)')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_funnel_stages_monotone_and_resample_dense(spark, sf_dir):
    from evolution_data_warehouse_spark.queries import REGISTRY

    stages = {
        r.stage: r.users
        for r in REGISTRY["funnel_conversion"].fn(spark, sf_dir).collect()
    }
    # each funnel stage can only lose users
    assert stages["signup"] >= stages["view_after_signup"]
    assert stages["view_after_signup"] >= stages["purchase_after_view"]

    # the resampled spine is dense: every user covers exactly
    # (last day - first day + 1) rows, no gaps and no duplicates
    spine = REGISTRY["ts_resample_daily"].fn(spark, sf_dir)
    bad = (
        spine.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("day").alias("nd"),
            (
                F.datediff(F.max("day"), F.min("day")) + F.lit(1)
            ).alias("span"),
        )
        .filter((F.col("n") != F.col("span")) | (F.col("nd") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_pack_render_bins_match_pack_sequences(spark, sf_dir):
    from evolution_data_warehouse_spark.queries import REGISTRY

    rendered = REGISTRY["pack_render"].fn(spark, sf_dir)
    packed = REGISTRY["pack_sequences"].fn(spark, sf_dir)
    by_bin = packed.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )
    # rendering reorganizes, never drops: same bins, same doc counts,
    # same token totals
    diff = (
        rendered.select("bin_id", "n_docs", "bin_tokens")
        .exceptAll(by_bin.select("bin_id", "n_docs", "bin_tokens"))
        .count()
    )
    assert diff == 0
    assert rendered.count() == by_bin.count()


def test_twap_and_moving_avg_bounded_by_extremes(spark, sf_dir):
    from evolution_data_warehouse_spark.queries import REGISTRY
    from evolution_data_warehouse_spark.queries.common import t

    # TWAP is a convex combination of observed values: it must lie in
    # [min(value), max(value)] per user
    ev = REGISTRY["ts_time_weighted_avg"].fn(spark, sf_dir)
    bounds = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        ev.join(bounds, "user_id")
        .filter((F.col("twap") < F.col("lo")) | (F.col("twap") > F.col("hi")))
        .count()
    )
    assert bad == 0

    # same invariant for the 4-row moving average per supplier
    ma = REGISTRY["win_moving_avg"].fn(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    b2 = li.groupBy("l_suppkey").agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    bad2 = (
        ma.join(b2, "l_suppkey")
        .filter(
            (F.col("mov_avg_price") < F.col("lo"))
            | (F.col("mov_avg_price") > F.col("hi"))
        )
        .count()
    )
    assert bad2 == 0


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rates=st.dictionaries(
        st.sampled_from(["en", "fr", "de", "es", "zh"]),
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        max_size=5,
    )
)
@pytest.mark.slow
def test_mix_sample_rate_monotonic_and_subset(spark, rates):
    from evolution_data_warehouse_spark.operators.datapipe import mix_sample

    df = spark.createDataFrame(
        [(i, ["en", "fr", "de", "es", "zh"][i % 5]) for i in range(200)],
        "doc_id long, lang string",
    )
    kept_ids = {
        r.doc_id for r in mix_sample(df, rates=rates).select("doc_id").collect()
    }
    # monotonicity at a NON-degenerate point: doubling every rate must
    # keep a superset (bucket thresholds are monotone in the rate) —
    # comparing only against rate 1.0 would be vacuous since that keeps
    # every row
    doubled = {g: min(1.0, 2.0 * r) for g, r in rates.items()}
    doubled_ids = {
        r.doc_id
        for r in mix_sample(df, rates=doubled).select("doc_id").collect()
    }
    assert kept_ids <= doubled_ids
    # and rate 1.0 keeps everything in listed groups
    all_kept = {
        r.doc_id
        for r in mix_sample(df, rates={g: 1.0 for g in rates}).select("doc_id").collect()
    }
    assert doubled_ids <= all_kept
    assert len(all_kept) == 200


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(st.integers(0, 1000), st.booleans()), min_size=0, max_size=40
    )
)
def test_expectations_report_counts_match_python_model(spark, data):
    from evolution_data_warehouse_spark.operators.quality import (
        expectations_report,
    )

    df = spark.createDataFrame(
        [(v, ok) for v, ok in data] or [(0, True)],
        "x int, ok boolean",
    )
    if not data:
        df = df.limit(0)
    rep = {
        r.rule: (r.n_pass, r.n_fail, r.n_rows)
        for r in expectations_report(
            df, {"x_small": F.col("x") < 500, "flagged": F.col("ok")}
        ).collect()
    }
    n = len(data)
    exp_small = sum(1 for v, _ in data if v < 500)
    exp_ok = sum(1 for _, ok in data if ok)
    assert rep["x_small"] == (exp_small, n - exp_small, n)
    assert rep["flagged"] == (exp_ok, n - exp_ok, n)


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    from evolution_data_warehouse_spark.queries import REGISTRY
    from evolution_data_warehouse_spark.queries.common import t

    chunks = REGISTRY["text_chunk_overlap"].fn(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.lower(F.col("text")), " ")).alias("n_tok")
    )
    # coverage: last chunk must reach the final token — i.e. for every
    # doc, stride * last_chunk_id + chunk_len >= n_tok — and chunk 0
    # must exist for every doc (empty docs still chunk once)
    last = chunks.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last_id"),
        F.min("chunk_id").alias("first_id"),
        F.count("*").alias("n_chunks"),
    )
    j = last.join(docs, "doc_id")
    bad = j.join(
        chunks.select("doc_id", "chunk_id", "n_tokens"),
        (F.col("chunk_id") == F.col("last_id")) & (j.doc_id == chunks.doc_id),
    ).filter(
        (F.col("first_id") != 0)
        | (F.lit(12) * F.col("last_id") + F.col("n_tokens") < F.col("n_tok"))
    )
    assert bad.count() == 0
    assert last.count() == docs.count()

    # per-BOUNDARY continuity: each chunk must start no later than the
    # previous chunk's end + 1, i.e. stride <= previous chunk length —
    # the end-reached check alone would miss mid-document gaps
    from evolution_data_warehouse_spark.queries.llm_ops import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    assert _CHUNK_STRIDE <= _CHUNK_SIZE
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy("chunk_id")
    gaps = (
        chunks.withColumn("prev_n", F.lag("n_tokens").over(w))
        .filter(
            F.col("prev_n").isNotNull()
            & (F.lit(_CHUNK_STRIDE) > F.col("prev_n"))
        )
        .count()
    )
    assert gaps == 0


def test_cohort_and_transition_structural_invariants(spark, sf_dir):
    from evolution_data_warehouse_spark.queries import REGISTRY
    from evolution_data_warehouse_spark.queries.common import t

    ev = t(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()

    # every user is active in their own first week: the offset-0 row of
    # each cohort must count exactly the cohort's members, and summing
    # offset-0 across cohorts recovers the full user population
    cohort = REGISTRY["cohort_retention"].fn(spark, sf_dir)
    week0 = (
        cohort.filter(F.col("week_offset") == 0)
        .agg(F.sum("active_users"))
        .collect()[0][0]
    )
    assert week0 == n_users

    # each user contributes (events - 1) transitions, so the matrix's
    # grand total is n_events - n_users
    trans = REGISTRY["event_transition_matrix"].fn(spark, sf_dir)
    total = trans.agg(F.sum("n_transitions")).collect()[0][0]
    assert total == n_events - n_users


# ---------------------------------------------------------------------------
# Image codec properties (hypothesis): arbitrary pixel arrays round-trip
# ---------------------------------------------------------------------------


@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    fmt=st.sampled_from(["bmp", "ppm", "png", "png_rgba"]),
)
@settings(max_examples=60, deadline=None)
def test_image_codec_roundtrip_property(h, w, seed, fmt):
    import numpy as np

    from evolution_data_warehouse_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_ppm,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    ch = 4 if fmt == "png_rgba" else 3
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    enc, dec = {
        "bmp": (encode_bmp, decode_bmp),
        "ppm": (encode_ppm, decode_ppm),
        "png": (encode_png, decode_png),
        "png_rgba": (encode_png, decode_png),
    }[fmt]
    w2, h2, out = dec(enc(px))
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, px)


@given(
    meta=st.dictionaries(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=12,
        ).filter(lambda s: "\x00" not in s),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=255),
            min_size=0,
            max_size=40,
        ),
        max_size=5,
    )
)
@settings(max_examples=40, deadline=None)
def test_png_text_metadata_property(meta):
    import numpy as np

    from evolution_data_warehouse_spark.operators.multimodal import (
        decode_png_text,
        encode_png,
    )

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_png_text(encode_png(px, text=meta)) == meta


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subsample=st.booleans(),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_roundtrip_property(h, w, seed, subsample):
    """Baseline JPEG decode-of-encode stays within the DCT-rounding
    bound for arbitrary dims/content: <=4 per channel at 4:4:4 (quant=1,
    only integer rounding), and chroma within the subsampling bound at
    4:2:0 while LUMA stays tight (chroma box-average + nearest upsample
    is the only extra loss)."""
    import numpy as np

    from evolution_data_warehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    if not subsample:
        # worst-case content: uniform noise; only DCT rounding loss
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        w2, h2, out = decode_jpeg(encode_jpeg(px))
        assert (w2, h2) == (w, h)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 4
    else:
        # 4:2:0 on noise clips chroma (inherent to subsampling, not a
        # bug), so the bound is asserted on random SMOOTH gradients
        # with mid-range offsets instead
        gx, gy = rng.integers(1, 8), rng.integers(1, 8)
        base = rng.integers(64, 192, size=3)
        px = np.zeros((h, w, 3), dtype=np.uint8)
        for c in range(3):
            px[:, :, c] = (
                base[c]
                + gx * np.arange(w)[None, :] // 4
                + gy * np.arange(h)[:, None] // 4
            ) % 256
        w2, h2, out = decode_jpeg(encode_jpeg(px, subsample=True))
        assert (w2, h2) == (w, h)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 12


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    cut=st.floats(min_value=0.05, max_value=0.98),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_truncation_never_hangs(seed, cut):
    """Truncated JPEG streams must fail fast with a clean exception
    (ValueError/IndexError/struct.error) or — when the cut lands in the
    entropy tail — decode what is structurally complete; never hang or
    segfault. Malformed-input behavior is part of the decode contract
    for a corpus-scale pipeline (one bad blob must not kill a batch
    silently or wedge an executor)."""
    import struct

    import numpy as np

    from evolution_data_warehouse_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8)
    data = encode_jpeg(px)
    trunc = data[: max(2, int(len(data) * cut))]
    try:
        w, h, out = decode_jpeg(trunc)
        # if it decoded, the declared geometry must hold
        assert out.shape == (h, w, 3)
    except (ValueError, IndexError, struct.error):
        pass


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    bpp=st.sampled_from([1, 4, 8]),
    rle=st.booleans(),
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_bmp_paletted_roundtrip_property(seed, bpp, rle, h, w):
    """Paletted BMP round-trip across every (bpp, compression) pair the
    decoder supports — random indices (runs included via low-entropy
    draws) survive packing, padding, and RLE escape codes exactly."""
    import numpy as np

    from evolution_data_warehouse_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp8,
        encode_bmp_rle,
        encode_bmp_sub8,
    )

    if rle and bpp == 1:
        bpp = 4  # RLE exists only for 4/8-bit
    rng = np.random.default_rng(seed)
    n = 1 << bpp
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    # low-entropy indices so runs, literals, and mixed rows all occur
    idx = rng.integers(0, n, (h, w), dtype=np.uint8)
    idx[:, : w // 2] = idx[:, :1]
    if rle:
        data = encode_bmp_rle(idx, pal, bpp)
    elif bpp == 8:
        data = encode_bmp8(idx, pal)
    else:
        data = encode_bmp_sub8(idx, pal, bpp)
    w2, h2, out = decode_bmp(data)
    assert (w2, h2) == (w, h)
    assert np.array_equal(out, pal[idx])


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_frames=st.integers(min_value=1, max_value=6),
    fps=st.integers(min_value=1, max_value=120),
    stride=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_avi_mjpeg_roundtrip_property(seed, n_frames, fps, stride):
    """AVI-MJPEG mux/demux property: arbitrary frame counts, rates, and
    strides round-trip byte-exactly, and sampling yields exactly the
    every-stride-th frames."""
    import numpy as np

    from evolution_data_warehouse_spark.operators.jpeg import encode_jpeg
    from evolution_data_warehouse_spark.operators.video import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
        sample_avi_frames,
    )

    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 17)), int(rng.integers(1, 17))
    frames = [
        encode_jpeg(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        for _ in range(n_frames)
    ]
    avi = encode_avi_mjpeg(frames, w, h, fps=fps)
    parsed = parse_avi_mjpeg(avi)
    assert (parsed["width"], parsed["height"], parsed["fps"]) == (w, h, fps)
    assert parsed["frames"] == frames
    sampled = sample_avi_frames(avi, stride)
    assert [i for i, _ in sampled] == list(range(0, n_frames, stride))
    assert all(f == frames[i] for i, f in sampled)


# ---------------------------------------------------------------------------
# window_spans (span-level substring dedup) vs the sequential model
# ---------------------------------------------------------------------------

_span_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
    min_size=1,
    max_size=6,
)


def _span_model(docs: list[list[str]], w: int) -> dict:
    """Obvious sequential model: count every w-token window corpus-wide,
    mark positions of windows seen >= 2 times, merge overlapping-or-
    adjacent [pos, pos+w-1] intervals per doc."""
    from collections import Counter

    wins = []
    for did, toks in enumerate(docs):
        for i in range(len(toks) - w + 1):
            wins.append((did, i, " ".join(toks[i : i + w])))
    cnt = Counter(k for _, _, k in wins)
    out = {}
    for did, toks in enumerate(docs):
        poss = [i for d, i, k in wins if d == did and cnt[k] >= 2]
        if not poss:
            continue
        spans: list[list[int]] = []  # [start, end, n_windows]
        for p in sorted(poss):
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + w - 1)
                spans[-1][2] += 1
            else:
                spans.append([p, p + w - 1, 1])
        out[did] = (
            len(toks),
            sum(c for _, _, c in spans),
            len(spans),
            sum(e - s + 1 for s, e, _ in spans),
        )
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_span_docs)
def test_window_spans_matches_sequential_model(spark, docs):
    from evolution_data_warehouse_spark.operators.dedup import window_spans

    w = 3
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)],
        "doc_id long, tk array<string>",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_windows, r.n_dup_spans, r.dup_tokens)
        for r in window_spans(df, w=w).collect()
    }
    assert got == _span_model(docs, w)


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup) vs the sequential model
# ---------------------------------------------------------------------------

_sem_vecs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # label
        st.lists(
            st.sampled_from([-1.0, 0.0, 0.5, 1.0]), min_size=4, max_size=4
        ),
    ),
    min_size=1,
    max_size=10,
)


def _sem_model(rows, tau):
    """Per label: fixed-point centroid sums, sequential-fold cosines
    (None on zero norms, mirroring NULLIF), removal = exists a
    tau-neighbor with (cent_cos, id) strictly lower (SQL null
    comparisons drop pairs involving a None cosine)."""
    import math

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        d = fold_dot(a, b)
        na, nb = math.sqrt(fold_dot(a, a)), math.sqrt(fold_dot(b, b))
        return None if na * nb == 0.0 else d / (na * nb)

    cents = {}
    for lbl in {l for l, _ in rows}:
        vs = [v for l, v in rows if l == lbl]
        cents[lbl] = [
            float(sum(int(math.floor(v[i] * 1e12)) for v in vs))
            for i in range(4)
        ]
    cc = [cos(v, cents[l]) for l, v in rows]
    out = {}
    for i, (li, vi) in enumerate(rows):
        better = 0
        for j, (lj, vj) in enumerate(rows):
            if j == i or lj != li:
                continue
            c = cos(vi, vj)
            if c is None or c < tau:
                continue
            if cc[i] is None or cc[j] is None:
                continue
            if cc[j] < cc[i] or (cc[j] == cc[i] and j < i):
                better += 1
        out[i] = (better, better > 0)
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_sem_vecs)
def test_semantic_dedup_matches_sequential_model(spark, rows):
    from evolution_data_warehouse_spark.operators.similarity import (
        semantic_dedup,
    )

    tau = 0.5
    df = spark.createDataFrame(
        [(i, lbl, [float(x) for x in vec]) for i, (lbl, vec) in enumerate(rows)],
        "vec_id long, label int, embedding array<float>",
    )
    got = {
        r.vec_id: (r.n_better_neighbors, r.removed)
        for r in semantic_dedup(df, tau).collect()
    }
    assert got == _sem_model(rows, tau)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_sem_vecs)
@pytest.mark.slow
def test_semantic_dedup_guard_properties(spark, rows):
    """The max_cluster guard's contract: with the cap above every
    cluster size the result is bit-identical to unguarded; with the cap
    forcing sub-splits, cent_cos is unchanged, n_better_neighbors can
    only shrink, and removed is a SUBSET of the unguarded removals
    (same-slice pairs are a subset of same-cluster pairs — the guard
    never fabricates a removal)."""
    from evolution_data_warehouse_spark.operators.similarity import (
        semantic_dedup,
    )

    tau = 0.5
    df = spark.createDataFrame(
        [(i, lbl, [float(x) for x in vec]) for i, (lbl, vec) in enumerate(rows)],
        "vec_id long, label int, embedding array<float>",
    )

    def snap(frame):
        return {
            r.vec_id: (r.cent_cos, r.n_better_neighbors, r.removed)
            for r in frame.collect()
        }

    unguarded = snap(semantic_dedup(df, tau, max_cluster=None))
    assert snap(semantic_dedup(df, tau, max_cluster=1000)) == unguarded
    forced = snap(semantic_dedup(df, tau, max_cluster=2))
    assert forced.keys() == unguarded.keys()
    for vid, (cc, n, rem) in forced.items():
        ucc, un, urem = unguarded[vid]
        assert cc == ucc
        assert n <= un
        assert (not rem) or urem


def test_oversize_clusters_audit(spark):
    from evolution_data_warehouse_spark.operators.similarity import (
        oversize_clusters,
    )

    df = spark.createDataFrame(
        [(i, 0 if i < 10 else 1, [1.0, 0.0]) for i in range(13)],
        "vec_id long, label int, embedding array<float>",
    )
    got = {
        r.label: (r.cluster_n, r.n_slices)
        for r in oversize_clusters(df, max_cluster=3).collect()
    }
    assert got == {0: (10, 4)}  # label 1 (3 members) is under the cap


# ---------------------------------------------------------------------------
# product quantization: exactness vs numpy model + measured ADC recall
# ---------------------------------------------------------------------------


def test_pq_assign_exactness_and_recall(spark, sf_dir):
    """pq_assign's fixed-point codes match an independent numpy model
    bit-for-bit, and the trained codebooks earn their keep OUT OF
    SAMPLE: trained on sf0.01, evaluated here on the sf0.001 table,
    the ADC shortlist of 100 covers >= 60% of the exact-distance
    top-10 (measured 0.7; candidate-generation framing — PQ
    shortlists, exact reranks), where untrained random codebooks
    measured 0%."""
    import numpy as np

    from evolution_data_warehouse_spark.operators.similarity import (
        PQ_SCALE,
        pq_adc_lut,
        pq_assign,
        pq_quantize_codebooks,
    )
    from evolution_data_warehouse_spark.queries.common import t
    from evolution_data_warehouse_spark.queries.extensions_r9 import (
        _PQ_BOOKS,
        _PQ_QUERY,
    )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = sorted(
        (r.vec_id, list(r.embedding)) for r in emb.collect()
    )
    V = np.array([v for _, v in rows], dtype=np.float64)
    qb = np.array(pq_quantize_codebooks(_PQ_BOOKS))
    vq = np.floor(V * PQ_SCALE).astype(np.int64).reshape(len(V), 8, 8)
    d = ((vq[:, :, None, :] - qb[None]) ** 2).sum(axis=3)
    model_codes = d.argmin(axis=2)  # argmin ties -> lowest index, same rule

    got = {
        r.vec_id: [r[f"code{j}"] for j in range(8)]
        for r in pq_assign(emb, _PQ_BOOKS).collect()
    }
    for idx, (vid, _) in enumerate(rows):
        assert got[vid] == list(model_codes[idx]), vid

    lut = np.array(pq_adc_lut(_PQ_BOOKS, _PQ_QUERY))
    adc = lut[np.arange(8)[None, :], model_codes].sum(axis=1)
    q = np.array(_PQ_QUERY)
    exact = ((V - q[None]) ** 2).sum(axis=1)
    shortlist = set(np.argsort(adc, kind="stable")[:100])
    top10 = set(np.argsort(exact, kind="stable")[:10])
    assert len(shortlist & top10) / 10 >= 0.6, len(shortlist & top10)

    # IVF-PQ composition (sim_ivfpq_topk): probing 4 of 16 coarse lists
    # touches a bounded corpus fraction — the scan-cost claim. Recall
    # through the probe is data-limited on these near-isotropic
    # vectors (documented in the query); assert the fraction, and that
    # probed lists are exactly the nearest-coarse-centroid choice.
    from evolution_data_warehouse_spark.operators.similarity import (
        pq_probe_lists,
    )
    from evolution_data_warehouse_spark.queries.pq_codebooks import (
        PQ_COARSE,
    )

    qc = np.array(pq_quantize_codebooks([PQ_COARSE])[0])
    vq_full = np.floor(V * PQ_SCALE).astype(np.int64)
    lists = ((vq_full[:, None, :] - qc[None]) ** 2).sum(axis=2).argmin(axis=1)
    probes = pq_probe_lists(PQ_COARSE, _PQ_QUERY, 4)
    qq = np.array([round(x * PQ_SCALE) for x in _PQ_QUERY])
    qdist = ((qq[None, :] - qc) ** 2).sum(axis=1)
    assert probes == sorted(np.argsort(qdist, kind="stable")[:4].tolist(),
                            key=lambda lid: (qdist[lid], lid))
    frac = float(np.isin(lists, probes).mean())
    assert frac < 0.5, frac  # bounded scan: well under half the corpus

    # IVFADC+refine (sim_ivfpq_refine): the exact re-rank of the ADC
    # top-100 must recover the TRUE fixed-point ranking among probed
    # rows (the shortlist covers the probed exact top-25 — refine
    # fixes quantization error completely here), and can only improve
    # on ADC-ranked ordering (measured 0.28 vs 0.20 recall@25 against
    # the full-corpus exact top-25; overall recall stays probe-limited
    # on these near-isotropic vectors, as documented in the query).
    vids = np.array([vid for vid, _ in rows])
    mask = np.isin(lists, probes)
    cand = sorted(np.where(mask)[0], key=lambda i: (adc[i], vids[i]))[:100]
    exact_fp = ((vq_full - qq[None]) ** 2).sum(axis=1)
    refine25 = sorted(cand, key=lambda i: (exact_fp[i], vids[i]))[:25]
    probed_top25 = sorted(
        np.where(mask)[0], key=lambda i: (exact_fp[i], vids[i])
    )[:25]
    assert refine25 == probed_top25
    top25 = set(np.argsort(exact_fp, kind="stable")[:25])
    r_refine = len(set(refine25) & top25)
    r_adc = len(set(cand[:25]) & top25)
    assert r_refine >= r_adc, (r_refine, r_adc)
    assert r_refine >= 7, r_refine  # measured 7/25 at sf0.001

    # and the engine's sim_ivfpq_refine returns exactly this model
    from evolution_data_warehouse_spark.queries.extensions_r10 import (
        sim_ivfpq_refine,
    )

    got_refine = [
        (r.vec_id, r.exact_dist)
        for r in sim_ivfpq_refine(spark, sf_dir).collect()
    ]
    want = [(int(vids[i]), int(exact_fp[i])) for i in refine25]
    assert got_refine == want


# ---------------------------------------------------------------------------
# dhash64 perceptual hash: invariances + banded pair recall
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    shift=st.integers(min_value=0, max_value=60),
    sx=st.integers(min_value=1, max_value=3),
    sy=st.integers(min_value=1, max_value=3),
)
def test_dhash64_invariances(seed, h, w, shift, sx, sy):
    """dHash is exactly invariant to uniform brightness shift (no
    clipping) and to pixel-replication upscaling when the upscaled
    dims stay multiples of the grid (w,h multiplied whole); 2-D gray
    and 3-D gray-replicated RGB hash identically."""
    from evolution_data_warehouse_spark.operators.phash import dhash64

    import numpy as np

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 196, (h, w), dtype=np.uint8)  # 195+60 < 256
    base = dhash64(gray)
    assert dhash64(gray + shift) == base
    up = np.repeat(np.repeat(gray, sy, axis=0), sx, axis=1)
    # exact invariance needs block boundaries to align: guaranteed when
    # original dims are multiples of the 9x8 grid
    if h % 8 == 0 and w % 9 == 0:
        assert dhash64(up) == base
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    assert dhash64(rgb) == base
    assert -(2**63) <= base < 2**63


def test_dhash_pairs_recall_and_guard(spark):
    """Banding recall (every pair within max_dist shares a band —
    pigeonhole) and the default-ON hot-bucket guard (a degenerate
    bucket above max_bucket is dropped from candidate generation)."""
    from evolution_data_warehouse_spark.operators.phash import dhash_pairs

    base_hash = 0x123456789ABCDEF0
    rows = [(0, base_hash)]
    # ids 1..3: flip 1..3 distinct bits spread across bands
    for i, bits in enumerate([(0,), (5, 21), (2, 30, 55)], start=1):
        v = base_hash
        for b in bits:
            v ^= 1 << b
        rows.append((i, v))
    rows.append((4, base_hash ^ 0xF0F0))  # distance 8: outside
    df = spark.createDataFrame(rows, "doc_id long, dhash long")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dhash_pairs(df, max_dist=3).collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2 and got[(0, 3)] == 3
    assert (0, 4) not in got
    # distances between the flipped variants that fall within 3
    assert got[(1, 2)] == 3
    # hot bucket: 40 identical hashes with max_bucket=10 are dropped
    hot = spark.createDataFrame(
        [(100 + i, 7777) for i in range(40)], "doc_id long, dhash long"
    )
    assert dhash_pairs(hot, max_bucket=10).count() == 0
    assert dhash_pairs(hot, max_bucket=None).count() == 40 * 39 // 2


# ---------------------------------------------------------------------------
# r11 retrieval / graph / sink properties — independent re-derivations
# beyond the DuckDB oracles
# ---------------------------------------------------------------------------


def test_bm25_matches_pure_python_model(spark, sf_dir):
    """Re-derive the BM25 top-k with a from-scratch pure-Python scorer
    (same integer quantization) — an implementation independent of
    both Spark and DuckDB."""
    from collections import Counter

    from evolution_data_warehouse_spark.queries.extensions_r11 import (
        _BM25_FP,
        _BM25_QUERIES,
        _BM25_TOP_K,
        text_bm25_topk,
    )
    from evolution_data_warehouse_spark.queries.common import t

    docs = {
        r["doc_id"]: (r["text"] or "").lower().split(" ")
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    dl = {d: len(tk) for d, tk in docs.items()}
    total = sum(dl.values())
    n = len(docs)
    df = Counter()
    tfs = {d: Counter(tk) for d, tk in docs.items()}
    for tf in tfs.values():
        df.update(tf.keys())
    expected = []
    for qid, terms in _BM25_QUERIES:
        scored = []
        for d, tf in tfs.items():
            s = 0
            for w in terms:
                if tf[w] == 0:
                    continue
                num = (2 * n - 2 * df[w] + 1) * 22 * tf[w] * total
                den = (2 * df[w] + 1) * (
                    10 * total * tf[w] + 3 * total + 9 * dl[d] * n
                )
                s += num * _BM25_FP // den
            if s > 0 or any(tf[w] for w in terms):
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[:_BM25_TOP_K], start=1):
            expected.append((qid, d, s, rank))
    got = sorted(
        map(tuple, text_bm25_topk(spark, sf_dir).collect()),
        key=lambda x: (x[0], x[3]),
    )
    assert got == sorted(expected, key=lambda x: (x[0], x[3]))


def test_pagerank_mass_and_shape(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11 import (
        _PR_FP,
        _PR_TOP,
        graph_pagerank,
    )

    rows = graph_pagerank(spark, sf_dir).collect()
    assert 0 < len(rows) <= _PR_TOP
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    prs = [r["pagerank_q"] for r in rows]
    # ranks sorted descending with deterministic tie-break, all
    # positive, and no single node can exceed the total mass (floor
    # divisions only ever LEAK mass, never create it)
    assert prs == sorted(prs, reverse=True)
    assert all(0 < p <= _PR_FP for p in prs)


def test_shuffled_shards_ranges_disjoint_and_clean(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11 import (
        snk_shuffled_shards,
    )

    rows = sorted(
        snk_shuffled_shards(spark, sf_dir).collect(),
        key=lambda r: r["shard"],
    )
    assert rows, "no shards written"
    for r in rows:
        assert r["n_misplaced"] == 0
        assert r["n_bad_rk"] == 0
        assert r["min_rk"] <= r["max_rk"]
    # key ranges must be disjoint and ordered: reading shards 0..S in
    # order IS the epoch permutation
    for a, b in zip(rows, rows[1:]):
        assert a["max_rk"] < b["min_rk"]


def test_inverted_index_postings_sorted_and_consistent(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11 import (
        _INV_POSTINGS_CAP,
        text_inverted_index,
    )

    for r in text_inverted_index(spark, sf_dir).collect():
        posts = r["postings"].split(",") if r["postings"] else []
        ids = [int(p.split(":")[0]) for p in posts]
        tfs = [int(p.split(":")[1]) for p in posts]
        assert ids == sorted(ids)
        assert len(posts) == r["n_postings"] == min(
            r["df"], _INV_POSTINGS_CAP
        )
        assert all(v >= 1 for v in tfs)
        assert r["cf"] >= r["df"]  # every posting has tf >= 1


def test_rrf_fusion_scores_recompute(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11 import (
        _RRF_FP,
        _RRF_K,
        _RRF_LIST,
        _RRF_TOP,
        sim_rrf_fusion,
    )

    rows = sim_rrf_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= _RRF_TOP
    for r in rows:
        expect = 0
        if r["r_lex"] is not None:
            assert 1 <= r["r_lex"] <= _RRF_LIST
            expect += _RRF_FP // (_RRF_K + r["r_lex"])
        if r["r_vec"] is not None:
            assert 1 <= r["r_vec"] <= _RRF_LIST
            expect += _RRF_FP // (_RRF_K + r["r_vec"])
        assert r["r_lex"] is not None or r["r_vec"] is not None
        assert r["rrf_q"] == expect


# ---------------------------------------------------------------------------
# r11b batch invariants
# ---------------------------------------------------------------------------


def test_rsi_and_bollinger_bounds(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        win_bollinger,
        win_rsi,
    )

    rsi_rows = win_rsi(spark, sf_dir).collect()
    assert rsi_rows, "RSI produced no rows"
    assert all(0.0 <= r["rsi"] <= 100.0 for r in rsi_rows)

    boll_rows = win_bollinger(spark, sf_dir).collect()
    assert boll_rows, "Bollinger produced no rows"
    for r in boll_rows:
        # sigma >= 0 by construction, so the bands bracket the mid
        assert r["lower_band"] <= r["mid"] <= r["upper_band"]
        assert r["band_break"] in (-1, 0, 1)


def test_spearman_in_unit_interval(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        stats_spearman_corr,
    )

    rows = stats_spearman_corr(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["rho"] <= 1.0
        assert r["n"] > 0


def test_kfold_partitions_every_document(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.common import t
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _K_FOLDS,
        split_kfold_hash,
    )

    rows = split_kfold_hash(spark, sf_dir).collect()
    folds = {r["fold"] for r in rows}
    assert folds <= set(range(_K_FOLDS))
    docs = t(spark, sf_dir, "documents")
    total = docs.count()
    sum_ids = docs.agg(F.sum("doc_id")).collect()[0][0]
    # every document lands in exactly one fold: counts AND id-sums
    # partition the corpus
    assert sum(r["n_docs"] for r in rows) == total
    assert sum(r["sum_doc_id"] for r in rows) == sum_ids


def test_date_spine_contiguous_and_calendar_sane(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        dim_date_spine,
    )

    rows = sorted(
        dim_date_spine(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows
    # contiguous: one row per day, no gaps
    assert (rows[-1]["day"] - rows[0]["day"]).days + 1 == len(rows)
    for r in rows:
        assert 0 <= r["dow"] <= 6
        assert 1 <= r["mo"] <= 12
        assert r["qtr"] == (r["mo"] + 2) // 3
        assert r["is_weekend"] == (1 if r["dow"] >= 5 else 0)
        # python is the third engine for the dow convention:
        # weekday() is 0=Monday, exactly our anchor arithmetic
        assert r["dow"] == r["day"].weekday()


def test_jaccard_neighbors_scores_valid(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _JACCARD_FP,
        _JACCARD_TOP,
        _MAX_NBR_DEG,
        graph_jaccard_neighbors,
    )

    rows = graph_jaccard_neighbors(spark, sf_dir).collect()
    assert 0 < len(rows) <= _JACCARD_TOP
    scores = [r["jaccard_fp"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["u"] < r["w"]
        assert 2 <= r["common"] <= min(r["deg_u"], r["deg_w"])
        assert r["deg_u"] <= _MAX_NBR_DEG and r["deg_w"] <= _MAX_NBR_DEG
        assert 0 < r["jaccard_fp"] <= _JACCARD_FP


def test_webdataset_tars_are_deterministic_and_well_formed(spark, sf_dir):
    import hashlib
    import os
    import tarfile

    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _WDS_SHARDS,
        snk_webdataset_shards,
    )
    from evolution_data_warehouse_spark.queries.relational import _scratch

    base = _scratch("snk_webdataset_shards", sf_dir)

    def run_and_digest():
        rows = snk_webdataset_shards(spark, sf_dir).collect()
        digests = {}
        for name in sorted(os.listdir(base)):
            if not name.endswith(".tar"):
                continue
            with open(os.path.join(base, name), "rb") as fh:
                digests[name] = hashlib.md5(fh.read()).hexdigest()
        return rows, digests

    rows1, d1 = run_and_digest()
    rows2, d2 = run_and_digest()
    # byte-identical tars across runs — any worker can rebuild the
    # exact shard from ids alone
    assert d1 == d2 and len(d1) == _WDS_SHARDS
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))
    assert all(r["n_bad_rk"] == 0 for r in rows1)
    # WebDataset convention: members come in same-basename sample
    # pairs, .txt + .json, in that order
    for name in d1:
        with tarfile.open(os.path.join(base, name)) as tar:
            members = tar.getnames()
        assert len(members) % 2 == 0
        for i in range(0, len(members), 2):
            stem_a, ext_a = os.path.splitext(members[i])
            stem_b, ext_b = os.path.splitext(members[i + 1])
            assert stem_a == stem_b and (ext_a, ext_b) == (".txt", ".json")


def test_fk_orphans_covers_every_relation(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _FK_RELATIONS,
        quality_fk_orphans,
    )

    rows = quality_fk_orphans(spark, sf_dir).collect()
    assert len(rows) == len(_FK_RELATIONS)
    labels = {r["relation"] for r in rows}
    assert labels == {rel[0] for rel in _FK_RELATIONS}
    for r in rows:
        assert 0 <= r["n_orphans"] <= r["n_child"]


def test_window_funnel_depths_partition_viewers(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.common import t
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        event_window_funnel,
    )

    rows = event_window_funnel(spark, sf_dir).collect()
    assert rows and all(r["depth"] in (1, 2, 3) for r in rows)
    viewers = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .count()
    )
    # every user with >=1 view lands in exactly one depth bucket
    assert sum(r["n_users"] for r in rows) == viewers


def test_epoch_schedule_budget_invariants(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _EPOCH_BUDGET,
        _EPOCH_FP,
        _EPOCH_MAX_REPEAT,
        corpus_epoch_schedule,
    )

    rows = corpus_epoch_schedule(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["tokens_granted"] <= r["alloc_target"]
        assert r["tokens_granted"] <= _EPOCH_MAX_REPEAT * r["tokens_available"]
        assert r["shortfall"] == max(
            0, r["alloc_target"] - _EPOCH_MAX_REPEAT * r["tokens_available"]
        )
        assert 0 <= r["repeat_fp"] <= _EPOCH_MAX_REPEAT * _EPOCH_FP
    # uniform split never over-commits the budget
    assert sum(r["tokens_granted"] for r in rows) <= _EPOCH_BUDGET


def test_keyset_page_strictly_after_cursor_and_ordered(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _PAGE_CURSOR_DATE,
        _PAGE_CURSOR_KEY,
        _PAGE_SIZE,
        limit_keyset_page,
    )
    import datetime

    rows = limit_keyset_page(spark, sf_dir).collect()
    assert 0 < len(rows) <= _PAGE_SIZE
    cursor = (
        datetime.date.fromisoformat(_PAGE_CURSOR_DATE),
        _PAGE_CURSOR_KEY,
    )
    keys = [(r["o_orderdate"], r["o_orderkey"]) for r in rows]
    assert all(k > cursor for k in keys)
    # total order, no duplicates: pages can never overlap or skip
    assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_pk_uniqueness_reports_known_fixture_violation(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        quality_pk_uniqueness,
    )

    rows = {r["tbl"]: r for r in quality_pk_uniqueness(spark, sf_dir).collect()}
    for r in rows.values():
        assert 0 <= r["n_distinct"] <= r["n_rows"]
    # the audit must REPORT the fixture's genuine composite-key
    # violation, not assume cleanliness
    assert rows["lineitem"]["n_distinct"] < rows["lineitem"]["n_rows"]
    assert rows["orders"]["n_distinct"] == rows["orders"]["n_rows"]


def test_threshold_sweep_monotone(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        _SWEEP_THRESHOLDS,
        dedup_threshold_sweep,
    )

    rows = sorted(
        dedup_threshold_sweep(spark, sf_dir).collect(),
        key=lambda r: r["thr"],
    )
    assert [r["thr"] for r in rows] == sorted(_SWEEP_THRESHOLDS)
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_flagged"] for r in rows]
    # tightening the threshold can only shrink the flagged set
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)
    assert all(d <= 2 * p for p, d in zip(pairs, docs))


def test_session_windows_match_gap_model(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.common import t
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        stream_session_windows,
    )

    rows = stream_session_windows(spark, sf_dir).collect()
    total = t(spark, sf_dir, "events").count()
    # sessions partition the event stream
    assert sum(r["n_events"] for r in rows) == total
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_start"])
        for s in sess:
            assert s["session_end"] > s["session_start"]
        # gap semantics: the next session starts strictly after the
        # previous window closes (end = last event + gap)
        for a, b in zip(sess, sess[1:]):
            assert b["session_start"] > a["session_end"]


def test_rolling_median_bounded_by_frame_extremes(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.common import dsum, t
    from evolution_data_warehouse_spark.queries.extensions_r11b import (
        win_rolling_median,
    )

    med = {
        (r["o_orderpriority"], r["day"]): r["med"]
        for r in win_rolling_median(spark, sf_dir).collect()
    }
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", F.to_date("o_orderdate").alias("day"))
        .agg(dsum("o_totalprice", 2).alias("v"))
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r["o_orderpriority"], []).append((r["day"], r["v"]))
    for prio, pts in series.items():
        pts.sort()
        vals = [v for _, v in pts]
        for i, (day, _) in enumerate(pts):
            lo, hi = max(0, i - 7), min(len(vals), i + 8)
            window = vals[lo:hi]
            assert min(window) - 1e-4 <= med[(prio, day)] <= max(window) + 1e-4


def test_synth_datasource_reader_slices_partition_the_range():
    import pytest as _pytest

    from evolution_data_warehouse_spark.sources.pydatasource import (
        SynthRangeReader,
        synth_val,
    )

    r = SynthRangeReader({"n": "101", "parts": "4"})
    parts = r.partitions()
    assert len(parts) == 4
    seen = {}
    for p in parts:
        for row_id, part_id, val in r.read(p):
            assert row_id not in seen  # disjoint slices
            seen[row_id] = part_id
            assert part_id == p.value == row_id % 4
            assert val == synth_val(row_id)
    assert sorted(seen) == list(range(101))  # complete coverage
    with _pytest.raises(ValueError):
        SynthRangeReader({"n": "10", "parts": "0"})


def test_cross_substring_spans_constructed_example(spark):
    # Two docs sharing one verbatim 8-token run (>= w=5) and nothing
    # else: exactly one span of exactly 8 tokens, on the right pair.
    # A third doc shares nothing. A repeated run inside one pair on
    # two diagonals would show as two spans — covered by doc 4 which
    # contains the shared run twice.
    from evolution_data_warehouse_spark.operators.dedup import (
        cross_substring_spans,
    )

    shared = "the quick brown fox jumps over the lazy"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"uno dos tres {shared} cuatro"),
        (3, "nothing in common with anything else here at all"),
        (4, f"x1 {shared} x2 x3 x4 {shared} x5"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("tk")
    )
    out = {
        (r.doc_a, r.doc_b): (
            r.n_shared_spans,
            r.longest_span_tokens,
            r.shared_tokens,
        )
        for r in cross_substring_spans(docs, w=5).collect()
    }
    assert (1, 2) in out
    n, longest, total = out[(1, 2)]
    assert n == 1 and longest == 8 and total == 8
    # doc 4 shares the run with 1 and 2, twice each (two diagonals)
    assert out[(1, 4)][0] == 2 and out[(1, 4)][1] == 8
    assert out[(2, 4)][0] == 2
    assert not any(3 in pair for pair in out)


def test_opq_assign_matches_pure_python(spark):
    # The Arrow/numpy int64 pipeline must equal a from-scratch pure
    # Python-int evaluation of the same fixed-point spec (floor
    # quantize -> int matvec -> floor-div -> argmin, first-min ties).
    from evolution_data_warehouse_spark.operators.similarity import (
        OPQ_R_SCALE,
        PQ_SCALE,
        opq_assign,
        opq_quantize_rotation,
        pq_quantize_codebooks,
    )
    from evolution_data_warehouse_spark.queries.opq_model import (
        OPQ_BOOKS,
        OPQ_R,
    )
    import math

    vecs = [
        [math.sin(0.1 * i * (j + 1)) * 0.2 for i in range(64)]
        for j in range(7)
    ]
    df = spark.createDataFrame(
        [(j, v) for j, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: [r[f"code{j}"] for j in range(8)]
        for r in opq_assign(df, OPQ_R, OPQ_BOOKS).collect()
    }
    qrot = opq_quantize_rotation(OPQ_R)
    qbooks = pq_quantize_codebooks(OPQ_BOOKS)
    for vid, v in enumerate(vecs):
        vq = [math.floor(x * PQ_SCALE) for x in v]
        z = [
            sum(r * q for r, q in zip(row, vq)) // OPQ_R_SCALE
            for row in qrot
        ]
        codes = []
        for j, book in enumerate(qbooks):
            sub = z[j * 8 : (j + 1) * 8]
            dists = [
                sum((a - c) ** 2 for a, c in zip(sub, cent))
                for cent in book
            ]
            codes.append(dists.index(min(dists)))
        assert got[vid] == codes, f"vec {vid}"


def test_hll_distinct_error_within_sketch_bound(spark, sf_dir):
    # HLL with m=256 has ~1.04/sqrt(256) = 6.5% std error; assert
    # every group lands within a generous 4-sigma envelope — a wrong
    # register construction blows past this immediately.
    from evolution_data_warehouse_spark.queries.extensions_r12 import (
        agg_hll_distinct,
    )

    for r in agg_hll_distinct(spark, sf_dir).collect():
        rel = abs(r.est_distinct - r.n_exact) / r.n_exact
        assert rel < 0.26, f"{r.grp}: est {r.est_distinct} vs {r.n_exact}"


def test_markov_stationary_conserves_mass(spark, sf_dir):
    # Power iteration over a row-stochastic matrix preserves total
    # mass up to the documented per-edge floor leak: the sum must be
    # 1e12 minus at most (#edges x #iterations).
    from evolution_data_warehouse_spark.queries.extensions_r12 import (
        _MKV_FP,
        _MKV_T,
        event_markov_stationary,
    )

    rows = event_markov_stationary(spark, sf_dir).collect()
    total = sum(r.stationary_fp for r in rows)
    assert total <= _MKV_FP
    # K event types -> at most K^2 edges; generous leak envelope
    k = len(rows)
    assert total >= _MKV_FP - (k * k + k) * _MKV_T


def test_ccnet_buckets_are_ordered_thirds(spark, sf_dir):
    # Within each language: bucket sizes differ by at most 1 from the
    # exact thirds, and max(head) <= min(middle) <= ... under the
    # (score, doc_id) order — the rank semantics, not a quantile
    # approximation.
    from collections import defaultdict

    from evolution_data_warehouse_spark.queries.extensions_r12 import (
        text_quality_ccnet,
    )

    by_lang = defaultdict(lambda: defaultdict(list))
    for r in text_quality_ccnet(spark, sf_dir).collect():
        by_lang[r.lang][r.bucket].append((r.score_q, r.doc_id))
    for lang, buckets in by_lang.items():
        n = sum(len(v) for v in buckets.values())
        for b in ("head", "middle", "tail"):
            size = len(buckets.get(b, []))
            assert abs(size - n / 3) <= 1, (lang, b, size, n)
        assert max(buckets["head"]) <= min(buckets["middle"])
        assert max(buckets["middle"]) <= min(buckets["tail"])


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=5,
            max_size=18,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_cross_substring_matches_bruteforce_reference(spark, docs):
    """cross_substring_spans == an O(n^2 m^2) from-scratch reference
    over a tiny alphabet (dense repeats stress diagonal merging):
    for every doc pair and alignment offset, maximal runs of
    position-wise equal w-grams must agree in count, max and total."""
    from collections import defaultdict

    from evolution_data_warehouse_spark.operators.dedup import (
        cross_substring_spans,
    )

    w = 5
    rows = [(i, " ".join(tk)) for i, tk in enumerate(docs)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    got = {
        (r.doc_a, r.doc_b): (
            r.n_shared_spans,
            r.longest_span_tokens,
            r.shared_tokens,
        )
        for r in cross_substring_spans(sdf, w=w).collect()
    }

    def grams(tk):
        return [tuple(tk[i : i + w]) for i in range(len(tk) - w + 1)]

    expected = {}
    for ia in range(len(docs)):
        for ib in range(ia + 1, len(docs)):
            ga, gb = grams(docs[ia]), grams(docs[ib])
            runs = []
            by_diag = defaultdict(list)
            for pa, gra in enumerate(ga):
                for pb, grb in enumerate(gb):
                    if gra == grb:
                        by_diag[pa - pb].append(pa)
            for _diag, ps in by_diag.items():
                ps.sort()
                start = prev = ps[0]
                for p in ps[1:]:
                    if p == prev + 1:
                        prev = p
                    else:
                        runs.append(prev - start + w)
                        start = prev = p
                runs.append(prev - start + w)
            if runs:
                expected[(ia, ib)] = (
                    len(runs),
                    max(runs),
                    sum(runs),
                )
    assert got == expected


def test_cross_substring_maximal_constructed_example(spark):
    # doc 4 contains the shared 8-token run TWICE: the diagonal form
    # reports 2 spans / 16 shared tokens against doc 1, but doc 1's
    # own covered range is ONE 8-token interval — exactly what the
    # maximal form must report on the doc-1 side, while doc 4's side
    # covers both occurrences (16 tokens in 2 maximal spans).
    from evolution_data_warehouse_spark.operators.dedup import (
        cross_substring_maximal,
    )

    shared = "the quick brown fox jumps over the lazy"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"uno dos tres {shared} cuatro"),
        (3, "nothing in common with anything else here at all"),
        (4, f"x1 {shared} x2 x3 x4 {shared} x5"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("tk")
    )
    out = {
        (r.doc_a, r.doc_b): r.asDict()
        for r in cross_substring_maximal(docs, w=5).collect()
    }
    r12 = out[(1, 2)]
    assert r12["n_max_spans_a"] == 1 and r12["covered_tokens_a"] == 8
    assert r12["n_max_spans_b"] == 1 and r12["covered_tokens_b"] == 8
    r14 = out[(1, 4)]
    assert r14["n_max_spans_a"] == 1 and r14["covered_tokens_a"] == 8
    assert r14["n_max_spans_b"] == 2 and r14["covered_tokens_b"] == 16
    assert r14["longest_span_a"] == 8 and r14["longest_span_b"] == 8
    assert not any(3 in pair for pair in out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=5,
            max_size=18,
        ),
        min_size=2,
        max_size=5,
    )
)
def test_cross_substring_maximal_matches_bruteforce_reference(spark, docs):
    """cross_substring_maximal == a from-scratch O(n^2 m^2) reference:
    per doc pair and per SIDE, the interval-coalesced union of matched
    w-gram windows (merge when next start <= prev start + w) must agree
    in span count, total coverage and longest span. The dense 4-letter
    alphabet stresses overlapping alignments — exactly what the maximal
    form de-overlaps and the diagonal form double-counts."""
    from evolution_data_warehouse_spark.operators.dedup import (
        cross_substring_maximal,
    )

    w = 5
    rows = [(i, " ".join(tk)) for i, tk in enumerate(docs)]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).select("doc_id", F.split(F.col("text"), " ").alias("tk"))
    got = {
        (r.doc_a, r.doc_b): (
            r.n_max_spans_a,
            r.covered_tokens_a,
            r.longest_span_a,
            r.n_max_spans_b,
            r.covered_tokens_b,
            r.longest_span_b,
        )
        for r in cross_substring_maximal(sdf, w=w).collect()
    }

    def grams(tk):
        return [tuple(tk[i : i + w]) for i in range(len(tk) - w + 1)]

    def coalesce(positions):
        ps = sorted(set(positions))
        spans = []
        start = prev = ps[0]
        for p in ps[1:]:
            if p <= prev + w:
                prev = p
            else:
                spans.append(prev - start + w)
                start = prev = p
        spans.append(prev - start + w)
        return (len(spans), sum(spans), max(spans))

    expected = {}
    for ia in range(len(docs)):
        for ib in range(ia + 1, len(docs)):
            ga, gb = grams(docs[ia]), grams(docs[ib])
            pos_a, pos_b = [], []
            for pa, gra in enumerate(ga):
                for pb, grb in enumerate(gb):
                    if gra == grb:
                        pos_a.append(pa)
                        pos_b.append(pb)
            if pos_a:
                expected[(ia, ib)] = coalesce(pos_a) + coalesce(pos_b)
    assert got == expected


def test_substring_maximal_bounded_by_diagonal_form(spark, sf_dir):
    # De-overlapped coverage can never exceed the per-diagonal total,
    # and every pair found by one form is found by the other (identical
    # anchor join underneath).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        dedup_substring_maximal,
    )
    from evolution_data_warehouse_spark.queries.extensions_r12 import (
        dedup_substring_cross,
    )

    mx = {
        (r.doc_a, r.doc_b): r
        for r in dedup_substring_maximal(spark, sf_dir).collect()
    }
    dg = {
        (r.doc_a, r.doc_b): r
        for r in dedup_substring_cross(spark, sf_dir).collect()
    }
    assert set(mx) == set(dg)
    for pair, r in mx.items():
        d = dg[pair]
        assert r.covered_tokens_a <= d.shared_tokens
        assert r.covered_tokens_b <= d.shared_tokens
        assert r.longest_span_a <= d.longest_span_tokens
        assert r.longest_span_b <= d.longest_span_tokens
        assert r.n_max_spans_a <= d.n_shared_spans
        assert r.n_max_spans_b <= d.n_shared_spans


def test_ann_frontier_invariants(spark, sf_dir):
    # Exact re-rank within candidates is the ceiling: any global top-10
    # member present in the candidate set ranks <= 10 in the exact
    # shortlist@50, so exact hits == |top10 ∩ cand| and bound the
    # quantized codecs; both hits and candidate counts are monotone in
    # probe depth for the exact codec (cand1 ⊆ cand2).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        sim_ann_frontier,
    )

    rows = {
        (r.nprobe, r.method): r
        for r in sim_ann_frontier(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    for p in (1, 2):
        assert rows[(p, "exact")].n_hit >= rows[(p, "pq")].n_hit
        assert rows[(p, "exact")].n_hit >= rows[(p, "opq")].n_hit
    assert rows[(2, "exact")].n_hit >= rows[(1, "exact")].n_hit
    assert (
        rows[(2, "exact")].n_candidates > rows[(1, "exact")].n_candidates
    )
    for (p, m), r in rows.items():
        assert r.n_truth == 10
        assert 0 <= r.n_hit <= r.n_truth
        assert r.recall_fp == r.n_hit * 1_000_000 // 10


def test_adc_batch_query0_matches_single_query_scan(spark, sf_dir):
    # Batch leg 0 IS the registered single-query workload: its top-10
    # by ADC distance must equal ranking sim_pq_assign's adc_dist
    # column directly (same pinned query, same codebooks).
    from evolution_data_warehouse_spark.queries.extensions_r9 import (
        sim_pq_assign,
    )
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        sim_adc_batch_topk,
    )

    got = [
        (r.vec_id, r.adc_dist)
        for r in sim_adc_batch_topk(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        .orderBy("rank")
        .collect()
    ]
    want = [
        (r.vec_id, r.adc_dist)
        for r in sim_pq_assign(spark, sf_dir)
        .orderBy("adc_dist", "vec_id")
        .limit(10)
        .collect()
    ]
    assert got == want


def test_pca_recon_energy_bounds(spark, sf_dir):
    # Orthonormal rotation: the leading-k capture can never exceed the
    # vector's own energy (floor-div jitter is absolutely bounded and
    # tiny vs energy); explained fraction lies in [0, 1e6].
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        emb_pca_recon_error,
    )

    rows = emb_pca_recon_error(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.energy > 0
        assert 0 <= r.captured_k <= r.energy
        assert 0 <= r.explained_ppm <= 1_000_000


def test_band_sweep_nested_configs_are_monotone(spark, sf_dir):
    # Band nesting at a fixed 16-signature budget: a (4x4) collision
    # implies both nested (8x2) collisions which imply the (16x1)
    # singles — so candidate volume falls and pair quality (mean
    # estimated Jaccard) rises as bands widen. (The hot-bucket guard
    # could in principle drop a loose-config bucket whose refinement
    # survives, but no fixture bucket approaches the cap.)
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        dedup_minhash_band_sweep,
    )

    rows = {
        r.rows_per_band: r
        for r in dedup_minhash_band_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {1, 2, 4, 8}
    assert (
        rows[1].n_pairs
        >= rows[2].n_pairs
        >= rows[4].n_pairs
        >= rows[8].n_pairs
    )
    nonempty = [r for _, r in sorted(rows.items()) if r.n_pairs > 0]
    for a, b in zip(nonempty, nonempty[1:]):
        assert a.mean_est_jaccard_fp <= b.mean_est_jaccard_fp


def test_permutation_test_ledger(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        stats_permutation_test,
    )
    from evolution_data_warehouse_spark.queries.common import t

    r = stats_permutation_test(spark, sf_dir).collect()[0]
    n_orders = t(spark, sf_dir, "orders").count()
    assert r.n_a + r.n_b == n_orders
    assert r.n_perms == 16
    assert 0 <= r.n_extreme <= r.n_perms
    assert r.p_value_fp == r.n_extreme * 1_000_000 // 16


def test_token_budget_plan_conserves_budget(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        _BUDGET_TOKENS,
        corpus_token_budget_plan,
    )

    rows = corpus_token_budget_plan(spark, sf_dir).collect()
    assert rows
    total_target = sum(r.target_tokens for r in rows)
    # floor-division under-allocates by < 1 token per domain
    assert _BUDGET_TOKENS - len(rows) <= total_target <= _BUDGET_TOKENS
    for r in rows:
        assert (
            r.epochs_fp
            == r.target_tokens * 1_000_000 // r.available_tokens
        )


def test_t_closeness_triad_consistency(spark, sf_dir):
    # Same QI grain as k-anonymity/l-diversity: one row per
    # (nation, balance-bucket) class; TVD is a [0, 1] quantity in ppm.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        quality_t_closeness,
    )
    from evolution_data_warehouse_spark.queries.common import t

    rows = quality_t_closeness(spark, sf_dir).collect()
    classes = {(r.c_nationkey, r.bal_bucket) for r in rows}
    expected = {
        (r.c_nationkey, r.bal_bucket)
        for r in t(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0)
            .cast("long")
            .alias("bal_bucket"),
        )
        .distinct()
        .collect()
    }
    assert classes == expected
    for r in rows:
        assert 0 <= r.tvd_fp <= 1_000_000
        assert r.leaking == (r.tvd_fp > 350_000)


def test_modularity_ledger(spark, sf_dir):
    # Connected components have NO inter-community edges, so the
    # intra-edge ledger must account for every edge (sum e_c == m)
    # and the degree ledger for both endpoints (sum d_c == 2m);
    # total modularity = 1 - sum(d_c^2)/4m^2 lies in [0, 1).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        graph_modularity,
    )
    from evolution_data_warehouse_spark.queries.extensions_r7 import (
        _edges,
    )

    rows = graph_modularity(spark, sf_dir).collect()
    m = _edges(spark, sf_dir).count()
    assert sum(r.e_c for r in rows) == m
    assert sum(r.d_c for r in rows) == 2 * m
    q_total = sum(r.contribution_fp for r in rows) / 1e9
    assert 0 <= q_total < 1


def test_feature_hashing_mass_conservation(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        fe_feature_hashing,
    )
    from evolution_data_warehouse_spark.queries.common import t

    rows = fe_feature_hashing(spark, sf_dir).collect()
    n_cust = t(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == 2 * n_cust
    for r in rows:
        assert abs(r.signed_mass) <= r.n_rows
        assert 1 <= r.n_distinct_features
        assert 0 <= r.bucket < 32


def test_acf_multi_lag_consistent_with_lag1(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r10 import (
        ts_acf_lag1,
    )
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        ts_acf_multi_lag,
    )

    multi = {
        r.lag: r for r in ts_acf_multi_lag(spark, sf_dir).collect()
    }
    assert set(multi) == {1, 2, 3, 7}
    one = ts_acf_lag1(spark, sf_dir).collect()[0]
    assert multi[1].num_sum == one.num_sum
    assert multi[1].den_sum == one.den_sum
    for r in multi.values():
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs == r.n_days - r.lag


def test_knn_graph_shape(spark, sf_dir):
    from collections import defaultdict

    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        emb_knn_graph,
    )

    by_vec = defaultdict(list)
    for r in emb_knn_graph(spark, sf_dir).collect():
        by_vec[r.vec_id].append(r)
    assert by_vec
    for vid, rows in by_vec.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != vid for r in rows)
        assert len({r.centroid_id for r in rows}) == 1


def test_power_analysis_sane(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        stats_power_analysis,
    )

    rows = stats_power_analysis(spark, sf_dir).collect()
    assert len(rows) == 5  # the five market segments
    for r in rows:
        assert r.required_n_per_arm > 0
        assert r.variance >= 0


def test_seasonal_residual_flags_exceed_threshold(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        ts_seasonal_residual_anomaly,
    )

    for r in ts_seasonal_residual_anomaly(spark, sf_dir).collect():
        assert abs(r.z) > 3.0
        assert 1 <= r.dow <= 7


def test_quality_mix_report_conserves_corpus(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        corpus_quality_mix_report,
    )
    from evolution_data_warehouse_spark.queries.common import t

    rows = corpus_quality_mix_report(spark, sf_dir).collect()
    n_docs = t(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    total_ppm = sum(r.token_share_ppm for r in rows)
    # floor division under-counts by < 1 ppm per cell
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    assert any(r.quality_pass for r in rows)


def test_fertility_at_least_one_subword_per_word(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        tok_fertility_by_lang,
    )

    rows = tok_fertility_by_lang(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_subwords >= r.n_words  # a word is >= 1 subword
        assert r.fertility_fp >= 1_000_000


def test_lsh_recall_monotone_in_radius(spark, sf_dir):
    # Radius-1 candidates are a superset of radius-0 (the probe set
    # includes the home bucket), so both candidate volume and hits
    # are monotone; recall is a valid fraction.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        sim_lsh_recall_eval,
    )

    rows = {r.radius: r for r in sim_lsh_recall_eval(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    assert rows[1].n_candidates >= rows[0].n_candidates
    assert rows[1].n_hit >= rows[0].n_hit
    for r in rows.values():
        assert 0 <= r.n_hit <= r.n_truth
        assert r.recall_fp == r.n_hit * 1_000_000 // r.n_truth


def test_dp_release_noise_calibration(spark, sf_dir):
    # Laplace(b=2): |noise| is Exp(1/b); every draw is finite, the
    # noisy count equals true + noise at fpq precision, and the draw
    # is a pure function of the group key (stable across runs).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        quality_dp_count_release,
    )

    rows = quality_dp_count_release(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.n_noisy - (r.n_true + r.noise)) < 1e-4
        assert abs(r.noise) < 60.0  # ln(1e-12)*2 bound from the guard
    again = {
        r.c_nationkey: r.noise
        for r in quality_dp_count_release(spark, sf_dir).collect()
    }
    assert {r.c_nationkey: r.noise for r in rows} == again


def test_assortativity_in_valid_range(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        graph_assortativity,
    )

    r = graph_assortativity(spark, sf_dir).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.m2 % 2 == 0  # symmetric edge list: every edge twice
    assert r.sxx >= abs(r.sxy)  # Cauchy-Schwarz on identical marginals


def test_burstiness_matches_python_reference(spark, sf_dir):
    # Exact integer identity vs a from-scratch per-term recount.
    from collections import Counter, defaultdict

    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        text_burstiness_dispersion,
    )
    from evolution_data_warehouse_spark.queries.common import t

    got = {
        r.token: (r.df, r.ctf, r.dispersion_fp)
        for r in text_burstiness_dispersion(spark, sf_dir).collect()
    }
    docs = t(spark, sf_dir, "documents").select("text").collect()
    per_term = defaultdict(list)
    for row in docs:
        for tok, n in Counter((row.text or "").lower().split(" ")).items():
            per_term[tok].append(n)
    n_docs = len(docs)
    for tok, counts in per_term.items():
        if len(counts) < 20:
            assert tok not in got
            continue
        ctf = sum(counts)
        ctf2 = sum(c * c for c in counts)
        disp = (ctf2 * n_docs - ctf * ctf) * 1_000_000 // (ctf * n_docs)
        assert got[tok] == (len(counts), ctf, disp), tok


def test_ivm_retraction_equals_recompute(spark, sf_dir):
    # The maintained view must equal a from-scratch recompute over
    # (base - deletes + inserts) — engine-side, independent of the
    # DuckDB oracle (which checks the same identity).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        ivm_agg_retraction,
    )
    from evolution_data_warehouse_spark.queries.common import t

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in ivm_agg_retraction(spark, sf_dir).collect()
    }
    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    final = ev.filter(
        (F.col("event_id") % 4 == 0)
        | ((F.col("event_id") % 4 != 0) & (F.col("event_id") % 8 != 1))
    )
    want = {
        r.event_type: (r.n, r.s)
        for r in final.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == want


def test_rake_scores_match_python_reference(spark, sf_dir):
    # From-scratch RAKE recount: phrase runs split on the pinned
    # stopword union, deg/freq over phrase members, floor-quantized
    # per-word scores — the full corpus top-20 must agree exactly.
    from collections import defaultdict

    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        _RAKE_MAX_LEN,
        _RAKE_STOPS,
        _RAKE_TOP_K,
        text_keyphrase_rake,
    )
    from evolution_data_warehouse_spark.queries.common import t

    got = [
        (r.rank, r.phrase, r.n_occurrences, r.score_fp)
        for r in text_keyphrase_rake(spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]
    stops = set(_RAKE_STOPS)
    phrases = []
    for row in t(spark, sf_dir, "documents").select("text").collect():
        run = []
        for tok in (row.text or "").lower().split(" "):
            if tok in stops or tok == "":
                if 1 <= len(run) <= _RAKE_MAX_LEN:
                    phrases.append(" ".join(run))
                run = []
            else:
                run.append(tok)
        if 1 <= len(run) <= _RAKE_MAX_LEN:
            phrases.append(" ".join(run))
    freq, deg = defaultdict(int), defaultdict(int)
    for ph in phrases:
        ws = ph.split(" ")
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    counts = defaultdict(int)
    for ph in phrases:
        counts[ph] += 1
    scored = sorted(
        (
            (
                -sum(
                    deg[w] * 1_000_000 // freq[w]
                    for w in sorted(set(ph.split(" ")))
                ),
                ph,
            )
            for ph in counts
        )
    )[:_RAKE_TOP_K]
    want = [
        (i + 1, ph, counts[ph], -negscore)
        for i, (negscore, ph) in enumerate(scored)
    ]
    assert got == want


def test_theil_sen_is_exact_order_statistic(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        ts_theil_sen_trend,
    )

    r = ts_theil_sen_trend(spark, sf_dir).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    assert r.min_slope_fp <= r.theil_sen_slope_fp <= r.max_slope_fp


def test_vocab_coverage_monotone(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        tok_vocab_coverage_curve,
    )

    rows = sorted(
        tok_vocab_coverage_curve(spark, sf_dir).collect(),
        key=lambda r: r.vocab_size,
    )
    assert rows and rows[0].vocab_size == 10
    prev_cov = 0
    for r in rows:
        assert r.tokens_covered > prev_cov
        prev_cov = r.tokens_covered
        assert 0 < r.coverage_ppm <= 1_000_000
        assert r.coverage_ppm == r.tokens_covered * 1_000_000 // r.total_tokens


def test_asof_nearest_beats_or_ties_backward(spark, sf_dir):
    # For every purchase matched by BOTH variants, the nearest match's
    # |gap| can never exceed the backward match's gap (backward is a
    # feasible candidate of nearest); unmatched purchases still appear.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        join_asof_nearest,
    )
    from evolution_data_warehouse_spark.queries.common import t

    near = {
        r.purchase_id: r
        for r in join_asof_nearest(spark, sf_dir).collect()
    }
    n_purchases = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert len(near) == n_purchases
    # backward candidates within the same 2-day band, recomputed
    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("pts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts")
    )
    back = (
        p.join(
            v,
            (F.col("vu") == F.col("user_id"))
            & (F.col("vts") <= F.col("pts"))
            & (F.col("vts") >= F.expr("pts - INTERVAL 2 DAYS")),
        )
        .groupBy("pid")
        .agg(F.max("vts").alias("bvts"), F.max("pts").alias("pts"))
        .collect()
    )
    for r in back:
        gap_back = abs(
            (r.pts - r.bvts).total_seconds() * 1_000_000
        )
        assert near[r.pid].near_view_id is not None
        assert near[r.pid].gap_us <= gap_back + 1  # rounding slack


def test_cross_source_overlap_symmetric_and_bounded(spark, sf_dir):
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        corpus_cross_source_overlap,
    )

    rows = corpus_cross_source_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.n_common <= min(r.n_sh_a, r.n_sh_b)
        assert r.containment_a_ppm == r.n_common * 1_000_000 // r.n_sh_a
        assert r.containment_b_ppm == r.n_common * 1_000_000 // r.n_sh_b


def test_phash_sweep_monotone_and_fence_semantics(spark, sf_dir):
    # Thresholds nest; the family construction puts swap-variant pairs
    # at exactly distance 2, so fences 0/1 agree and 2/3 agree, with
    # the non-exact pairs appearing only from fence 2 on.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        mm_phash_threshold_sweep,
    )

    rows = {
        r.max_dist: r
        for r in mm_phash_threshold_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    assert (
        rows[0].n_pairs
        <= rows[1].n_pairs
        <= rows[2].n_pairs
        <= rows[3].n_pairs
    )
    assert rows[0].n_nonexact_pairs == rows[1].n_nonexact_pairs == 0
    assert rows[2].n_nonexact_pairs > 0
    assert rows[0].n_pairs == rows[1].n_pairs
    assert rows[2].n_pairs == rows[3].n_pairs


def test_er_blocking_eval_scheme_contrast(spark, sf_dir):
    # The stable-prefix scheme must retain every true pair (all
    # synthesized typos touch the name's tail), the tail scheme must
    # lose almost all of them, and costs/ledgers must be consistent.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        er_blocking_eval,
    )

    rows = {r.scheme: r for r in er_blocking_eval(spark, sf_dir).collect()}
    assert set(rows) == {"prefix17", "digits_mid", "last2"}
    assert rows["prefix17"].recall_ppm == 1_000_000
    assert rows["digits_mid"].recall_ppm == 1_000_000
    assert rows["last2"].recall_ppm < 100_000
    for r in rows.values():
        assert 0 <= r.n_retained <= r.n_true
        assert r.n_candidate_pairs > 0
        assert r.recall_ppm == r.n_retained * 1_000_000 // r.n_true


def test_bpe_merge_curve_monotone_compression(spark, sf_dir):
    # Each merge batch can only REDUCE subword count (a merge replaces
    # two tokens with one, never splits); 0 merges is the character-
    # tokenization ceiling; word count is constant across the curve.
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        tok_bpe_merge_curve,
    )

    rows = sorted(
        tok_bpe_merge_curve(spark, sf_dir).collect(),
        key=lambda r: r.n_merges,
    )
    assert [r.n_merges for r in rows] == [0, 4, 8, 12]
    assert len({r.n_words for r in rows}) == 1
    subs = [r.n_subwords for r in rows]
    assert subs == sorted(subs, reverse=True)
    assert subs[0] > subs[-1]  # the 12 merges actually compress
    for r in rows:
        assert r.fertility_fp == r.n_subwords * 1_000_000 // r.n_words


def test_clustering_coeff_consistent_with_triangle_closure(spark, sf_dir):
    # Coefficients are valid fractions; a node's closed wedges can't
    # exceed its wedge count; and the closed-wedge ledger sums to
    # 3x the global triangle count (each triangle closes one wedge at
    # each of its three corners).
    from evolution_data_warehouse_spark.queries.extensions_r13 import (
        graph_clustering_coeff,
    )
    from evolution_data_warehouse_spark.queries.extensions_r7 import (
        _edges,
    )
    from pyspark.sql import functions as SF

    rows = graph_clustering_coeff(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.clustering_fp <= 1_000_000
        assert r.n_closed_wedges <= r.degree * (r.degree - 1) // 2
    ed = _edges(spark, sf_dir).select("pa", "pb")
    e2 = ed.select(SF.col("pa").alias("qa"), SF.col("pb").alias("qb"))
    e3 = ed.select(SF.col("pa").alias("ra"), SF.col("pb").alias("rb"))
    n_tri = (
        ed.join(e2, SF.col("pb") == SF.col("qa"))
        .join(
            e3,
            (SF.col("ra") == SF.col("pa")) & (SF.col("rb") == SF.col("qb")),
        )
        .count()
    )
    assert sum(r.n_closed_wedges for r in rows) == 3 * n_tri
