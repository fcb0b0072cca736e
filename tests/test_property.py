"""Property-based pins (hypothesis) for determinism-critical operators:
each compares the distributed implementation against a pure-Python
reference on randomized inputs. Few examples per test — every example is a
Spark job — but randomized structure (ties, empties, skew) reaches corners
hand-written fixtures miss."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
    maintenance,
    sessions,
)
from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.packing import (
    pack_sequences,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # user_id — few users → long per-user chains
            st.integers(0, 10_000),  # seconds — duplicates likely
        ),
        min_size=1,
        max_size=60,
    ),
    gap=st.integers(1, 3_000),
)
def test_sessionize_matches_python_reference(spark, events, gap):
    rows = [(u, i, s) for i, (u, s) in enumerate(events)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "secs"]).select(
        "user_id", "event_id", F.timestamp_seconds("secs").alias("ts")
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessions.sessionize(df, "user_id", "ts", gap, ["event_id"]).collect()
    }

    expect = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, eid, s in rows:
        by_user.setdefault(u, []).append((s, eid))
    for u, evs in by_user.items():
        sid, prev = 0, None
        for s, eid in sorted(evs):  # (secs, event_id) — the same total order
            if prev is None or s - prev > gap:
                sid += 1
            expect[(u, eid)] = sid
            prev = s
    assert got == expect


@SETTINGS
@given(
    toks=st.lists(st.integers(0, 700), min_size=1, max_size=50),
    ctx=st.integers(1, 1024),
)
def test_pack_sequences_matches_python_reference(spark, toks, ctx):
    rows = [("s", i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "doc_id", "n_tok", "source", ctx).collect()
    }
    cum, expect = 0, {}
    for i, t in enumerate(toks):
        expect[i] = cum // ctx
        cum += t
    assert got == expect


@SETTINGS
@given(
    # values bounded to int64: Spark's createDataFrame silently nulls
    # Python ints that overflow LongType, which is a fixture artifact, not
    # merge semantics.
    target=st.dictionaries(
        st.integers(0, 30), st.integers(-(2**63), 2**63 - 1), max_size=20
    ),
    updates=st.dictionaries(
        st.integers(0, 30), st.integers(-(2**63), 2**63 - 1), max_size=10
    ),
    deletes=st.sets(st.integers(0, 30), max_size=10),
)
def test_merge_upsert_matches_dict_semantics(spark, target, updates, deletes):
    deletes -= set(updates)  # CDC contract: one net change per key
    if not target or (not updates and not deletes):
        return
    tdf = spark.createDataFrame(list(target.items()), ["k", "v"])
    src = [(k, v, False) for k, v in updates.items()]
    src += [(k, 0, True) for k in deletes]
    sdf = spark.createDataFrame(src, ["k", "v", "_deleted"])
    got = {
        r["k"]: r["v"]
        for r in maintenance.merge_upsert(tdf, sdf, ["k"], "_deleted").collect()
    }
    expect = dict(target)
    expect.update(updates)
    for k in deletes:
        expect.pop(k, None)
    assert got == expect


@SETTINGS
@given(
    points=st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
        min_size=2,
        max_size=40,
    )
)
def test_zorder_key_per_axis_monotone(spark, points):
    df = spark.createDataFrame(points, ["a", "b"]).distinct()
    rows = maintenance.zorder_key(df, ["a", "b"], bits=8).collect()
    got = {(r["a"], r["b"]): r["_zkey"] for r in rows}
    for k in got.values():
        assert 0 <= k < (1 << 16)
    # Morton keys are monotone along each axis when the SCALED coordinate
    # strictly increases (distinct raw values can collapse into one bucket
    # after min/max scaling — equality is legitimate then).
    by_b: dict[int, list[tuple[int, int]]] = {}
    by_a: dict[int, list[tuple[int, int]]] = {}
    for (a, b), k in got.items():
        by_b.setdefault(b, []).append((a, k))
        by_a.setdefault(a, []).append((b, k))
    for groups in (by_b, by_a):
        for pairs in groups.values():
            pairs.sort()
            for (c1, k1), (c2, k2) in zip(pairs, pairs[1:]):
                assert k1 <= k2, (pairs,)


@SETTINGS
@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),  # tiny vocab → heavy collisions
            max_size=20,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_tfidf_df_counts_match_python(spark, docs):
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        ranking,
    )

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        (r["id"], r["term"]): r["c"]
        for r in ranking.doc_terms(df, "doc_id", "text").collect()
    }
    expect: dict[tuple[int, str], int] = {}
    for i, text in enumerate(docs):
        for tok in text.split():
            # mirror normalize_text: lowercase + collapse — the alphabet is
            # already lowercase/space-only, so whitespace split suffices.
            expect[(i, tok)] = expect.get((i, tok), 0) + 1
    assert got == expect


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# --- media codecs: pure-python, no Spark job per example — more examples ---

_CODEC_SETTINGS = settings(max_examples=60, deadline=None)


@_CODEC_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_round_trip_property(w, h, seed):
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    d = multimodal.decode_bmp(multimodal.encode_bmp(px))
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["pixels"], px)
    assert d["pixel_sum"] == int(px.sum())


@_CODEC_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_property(w, h, seed):
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )

    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    d = multimodal.decode_png(multimodal.encode_png(px))
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["pixels"], px)
    assert d["pixel_sum"] == int(px.sum())


@_CODEC_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=60),
    h=st.integers(min_value=1, max_value=40),
    n_values=st.integers(min_value=1, max_value=256),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_round_trip_property(w, h, n_values, seed):
    # n_values=1 degenerates to constant fill (KwKwK-heavy); small values
    # produce long runs; 256 is full-entropy — together they sweep the LZW
    # dictionary behaviors (growth, width bumps, resets).
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )

    idx = np.random.default_rng(seed).integers(
        0, n_values, size=(h, w), dtype=np.uint8
    )
    d = multimodal.decode_gif(multimodal.encode_gif(idx))
    assert (d["width"], d["height"]) == (w, h)
    assert np.array_equal(d["indices"], idx)
    assert d["pixel_sum"] == int(idx.astype(np.int64).sum()) * 3


@_CODEC_SETTINGS
@given(
    n=st.integers(min_value=1, max_value=2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    channels=st.integers(min_value=1, max_value=2),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, rate, channels, seed):
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )

    samples = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=n * channels)
        .astype(np.int16)
    )
    d = multimodal.decode_wav(multimodal.encode_wav(samples, rate, channels))
    assert d["sample_rate"] == rate and d["n_channels"] == channels
    assert d["n_samples"] == n
    assert d["duration_ms"] == n * 1000 // rate
    assert np.array_equal(d["samples"], samples)


@_CODEC_SETTINGS
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    n=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_avi_round_trip_property(w, h, n, seed):
    import numpy as np

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        multimodal,
    )

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]
    d = multimodal.demux_avi(multimodal.encode_avi(frames))
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, n)
    assert [f["pixel_sum"] for f in d["frames"]] == [int(f.sum()) for f in frames]


# --- refsql dialect differential fuzz --------------------------------------
#
# The dialect builds DataFrame plans, so for the typed-table subset it must
# agree with Spark SQL exactly. Generate WHERE expression trees over the
# reference grammar (comparators, AND/OR/NOT, IN, BETWEEN, parens) and
# compare row sets against spark.sql on the same data.

_FUZZ_ROWS = [
    (1, "apple", 10.5, True),
    (2, "banana", 3.25, False),
    (3, "cherry", 10.5, True),
    (4, "date", 0.0, False),
    (5, "elderberry", 99.9, True),
    (6, "fig", -4.5, False),
    (7, "grape", 3.25, True),
]

_INT_LITS = [0, 1, 3, 5, 8]
_FLT_LITS = [0.0, 3.25, 10.5, 50.0]
_TXT_LITS = ["apple", "date", "zzz"]


def _where_exprs():
    ops = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
    atom = st.one_of(
        st.tuples(st.just("id"), ops, st.sampled_from(_INT_LITS)).map(
            lambda t: f"id {t[1]} {t[2]}"
        ),
        st.tuples(st.just("price"), ops, st.sampled_from(_FLT_LITS)).map(
            lambda t: f"price {t[1]} {t[2]}"
        ),
        st.tuples(ops, st.sampled_from(_TXT_LITS)).map(
            lambda t: f"name {t[0]} '{t[1]}'"
        ),
        st.sampled_from(["flag = TRUE", "flag = FALSE"]),
        st.lists(st.sampled_from(_INT_LITS), min_size=1, max_size=3).map(
            lambda v: f"id IN ({', '.join(map(str, v))})"
        ),
        st.tuples(st.sampled_from(_INT_LITS), st.sampled_from(_INT_LITS)).map(
            lambda t: f"id BETWEEN {min(t)} AND {max(t)}"
        ),
        # arithmetic comparison sides (round-5 value-expression surface)
        st.tuples(st.sampled_from(_INT_LITS), st.sampled_from(_FLT_LITS)).map(
            lambda t: f"id * 2 + {t[0]} > price - {t[1]}"
        ),
        st.sampled_from(_FLT_LITS).map(
            lambda v: f"price * ( 1 - 0.5 ) >= {v}"
        ),
    )
    expr = st.recursive(
        atom,
        lambda inner: st.one_of(
            st.tuples(inner, st.sampled_from(["AND", "OR"]), inner).map(
                lambda t: f"({t[0]} {t[1]} {t[2]})"
            ),
            inner.map(lambda e: f"NOT ({e})"),
        ),
        max_leaves=4,
    )
    return expr


_FUZZ_ENGINE = None


def _fuzz_engine(spark):
    """One engine per process (hypothesis re-enters the test function per
    example; rebuilding the table each time would dominate runtime)."""
    global _FUZZ_ENGINE
    if _FUZZ_ENGINE is None:
        import tempfile

        from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
            Engine,
        )

        root = tempfile.mkdtemp(prefix="sparkdb_fuzz_")
        eng = Engine(spark, root)
        eng.create_table(
            "t", [("id", "INT"), ("name", "TEXT"), ("price", "DECIMAL"), ("flag", "BOOL")]
        )
        eng.insert_rows(
            "t",
            [
                {"id": i, "name": n, "price": p, "flag": f}
                for i, n, p, f in _FUZZ_ROWS
            ],
        )
        eng.table("t").createOrReplaceTempView("fuzz_t")
        eng.create_table("u", [("key", "INT"), ("tag", "TEXT")])
        eng.insert_rows(
            "u",
            [
                {"key": 1, "tag": "x"},
                {"key": 2, "tag": "y"},
                {"key": 2, "tag": "z"},  # duplicate join key: fan-out
                {"key": 5, "tag": "x"},
                {"key": 9, "tag": "w"},  # matches nothing
            ],
        )
        eng.table("u").createOrReplaceTempView("fuzz_u")
        _FUZZ_ENGINE = eng
    return _FUZZ_ENGINE


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(where=_where_exprs())
def test_refsql_where_matches_spark_sql(spark, where):
    eng = _fuzz_engine(spark)
    got = sorted(
        r.id for r in eng.ref_sql(f"SELECT id FROM t WHERE {where}").collect()
    )
    want = sorted(
        r.id
        for r in spark.sql(f"SELECT id FROM fuzz_t WHERE {where}").collect()
    )
    assert got == want, f"WHERE {where}: refsql {got} != spark {want}"


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    where=_where_exprs(),
    order_col=st.sampled_from(["id", "price", "name"]),
    desc=st.booleans(),
    limit=st.integers(1, 8),
    offset=st.integers(0, 3),
)
def test_refsql_order_limit_offset_matches_spark_sql(
    spark, where, order_col, desc, limit, offset
):
    # Full SELECT shape: WHERE + ORDER BY + LIMIT/OFFSET must return the
    # same rows in the same order as Spark SQL. Tie-break on id so the
    # ordering is total on both engines.
    eng = _fuzz_engine(spark)
    sql = (
        f"SELECT id FROM {{t}} WHERE {where} "
        f"ORDER BY {order_col} {'DESC' if desc else 'ASC'}, id "
        f"LIMIT {limit} OFFSET {offset}"
    )
    got = [r.id for r in eng.ref_sql(sql.format(t="t")).collect()]
    want = [r.id for r in spark.sql(sql.format(t="fuzz_t")).collect()]
    assert got == want, f"{sql}: refsql {got} != spark {want}"


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    where=_where_exprs(),
    agg=st.sampled_from(
        ["MIN(price)", "MAX(price)", "SUM(id)", "AVG(id)"]
    ),
    having=st.integers(0, 3),
)
def test_refsql_group_agg_matches_spark_sql(spark, where, agg, having):
    # GROUP BY + aggregates + HAVING (both the standard COUNT(*) call
    # syntax and, implicitly, the aggregate output columns): compare value
    # tuples positionally — the dialect's reference output naming differs
    # from Spark SQL's.
    eng = _fuzz_engine(spark)
    got = sorted(
        tuple(r)
        for r in eng.ref_sql(
            f"SELECT flag, COUNT(*), {agg} FROM t WHERE {where} "
            f"GROUP BY flag HAVING COUNT(*) > {having} ORDER BY flag"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.sql(
            f"SELECT flag, COUNT(*), {agg} FROM fuzz_t WHERE {where} "
            f"GROUP BY flag HAVING COUNT(*) > {having} ORDER BY flag"
        ).collect()
    )
    assert got == want, f"agg={agg} where={where}: {got} != {want}"


# --- stateful DML + snapshot-history differential ---------------------------


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("insert"), st.integers(1, 3)),
            st.tuples(st.just("update"), st.integers(0, 100)),
            st.tuples(st.just("delete"), st.integers(0, 100)),
        ),
        min_size=2,
        max_size=7,
    ),
)
def test_dml_sequence_matches_model_and_snapshots(spark, tmp_path_factory, ops):
    """Differential state machine: apply a random INSERT/UPDATE/DELETE
    sequence through the dialect AND to a pure-Python model; after every
    op the table contents, the reported affected-row counts, and the
    retained snapshot history (keep_snapshots=3, copy-on-write retirement
    on UPDATE/DELETE only) must all match the model."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
        Engine,
    )

    e = Engine(spark, str(tmp_path_factory.mktemp("dmlfuzz")), keep_snapshots=3)
    e.create_table("t", [("id", "INT"), ("val", "INT"), ("tag", "TEXT")])
    model: list[dict] = []
    history: list[list[dict]] = []  # model state retired at each version
    next_id = 0
    for i, (kind, arg) in enumerate(ops):
        if kind == "insert":
            rows = [
                {"id": next_id + j, "val": (next_id + j) * 37 % 100, "tag": "new"}
                for j in range(arg)
            ]
            next_id += arg
            vals = ", ".join(f"({r['id']}, {r['val']}, 'new')" for r in rows)
            assert e.ref_sql(f"INSERT INTO t VALUES {vals}") == arg
            model.extend(rows)
        elif kind == "update":
            expect = sum(1 for r in model if r["val"] < arg)
            got = e.ref_sql(f"UPDATE t SET tag = 'u{i}' WHERE val < {arg}")
            assert got == expect, (kind, arg, got, expect)
            # copy-on-write: every UPDATE retires the pre-state (even when
            # it matched nothing — the rewrite IS the count pass)
            history.append([dict(r) for r in model])
            for r in model:
                if r["val"] < arg:
                    r["tag"] = f"u{i}"
        else:  # delete rows with even val below the threshold
            expect = sum(1 for r in model if r["val"] % 2 == 0 and r["val"] < arg)
            got = e.ref_sql(
                f"DELETE FROM t WHERE val < {arg} AND val IN "
                f"({', '.join(str(v) for v in range(0, 100, 2))})"
            )
            assert got == expect, (kind, arg, got, expect)
            history.append([dict(r) for r in model])
            model = [
                r for r in model if not (r["val"] % 2 == 0 and r["val"] < arg)
            ]
        # current contents match the model after every op
        live = {
            (r.id, r.val, r.tag) for r in e.ref_sql("SELECT * FROM t").collect()
        }
        assert live == {(r["id"], r["val"], r["tag"]) for r in model}
    # retained snapshots (last 3 retirements) replay the model's history
    vs = e.store.versions("t")
    assert len(vs) == min(3, len(history))
    for v, past in zip(vs, history[-len(vs):] if vs else []):
        snap = {
            (r.id, r.val, r.tag)
            for r in e.ref_sql(f"SELECT * FROM t VERSION AS OF {v}").collect()
        }
        assert snap == {(r["id"], r["val"], r["tag"]) for r in past}, v


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    how=st.sampled_from(["JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN",
                         "FULL JOIN"]),
    where=_where_exprs(),
)
def test_refsql_join_matches_spark_sql(spark, how, where):
    # Differential: the dialect's FROM-clause JOIN against Spark SQL on
    # the same data — join type, qualified ON, fan-out duplicate keys,
    # null-padded outer rows, and a fuzzed WHERE on the left side.
    eng = _fuzz_engine(spark)
    ref = eng.ref_sql(
        f"SELECT t.id, u.tag FROM t {how} u ON t.id = u.key WHERE {where}"
    ).collect()
    spk = spark.sql(
        f"SELECT fuzz_t.id, fuzz_u.tag FROM fuzz_t {how} fuzz_u "
        f"ON fuzz_t.id = fuzz_u.key WHERE {where}"
    ).collect()
    got = sorted((r.id, r.tag) for r in ref)
    want = sorted((r.id, r.tag) for r in spk)
    assert got == want, f"{how} WHERE {where}: {got} != {want}"


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    fn=st.sampled_from([
        ("ROW_NUMBER()", "row_number()"),
        ("RANK()", "rank()"),
        ("DENSE_RANK()", "dense_rank()"),
        ("SUM(price)", "sum(price)"),
        ("COUNT(*)", "count(*)"),
    ]),
    part=st.sampled_from(["", "PARTITION BY flag"]),
    order_col=st.sampled_from(["id", "price"]),
    desc=st.booleans(),
)
def test_refsql_window_matches_spark_sql(spark, fn, part, order_col, desc):
    # Differential: the dialect's OVER clause against Spark SQL — same
    # partitioning, ordering (with ties on price), and frame defaults.
    # Ties make rank()/sum() frame semantics observable; id tiebreak makes
    # row_number() deterministic.
    eng = _fuzz_engine(spark)
    d = "DESC" if desc else "ASC"
    over = f"({part} ORDER BY {order_col} {d}, id)"
    ref = eng.ref_sql(
        f"SELECT id, {fn[0]} OVER {over} AS w FROM t ORDER BY id"
    ).collect()
    spk = spark.sql(
        f"SELECT id, {fn[1]} OVER {over} AS w FROM fuzz_t ORDER BY id"
    ).collect()
    got = [(r.id, r.w) for r in ref]
    want = [(r.id, r.w) for r in spk]
    assert got == want, f"{fn[0]} OVER {over}: {got} != {want}"


_SUB_WHERES = [
    "key > 1", "key < 3", "key = 2", "key != 2", "tag = 'x'",
    "tag != 'w'", "key BETWEEN 2 AND 5", "key IN (1, 2, 9)",
    "key > 100",  # empty subquery result
]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    neg=st.booleans(),
    sub_where=st.sampled_from(_SUB_WHERES),
    outer=_where_exprs(),
)
def test_refsql_in_subquery_matches_spark_sql(spark, neg, sub_where, outer):
    # Differential: [NOT] IN (SELECT ...) against Spark SQL's native
    # subquery planning — semi/anti rewrites, duplicate subquery values,
    # the empty-subquery corner, combined with a fuzzed outer conjunct.
    eng = _fuzz_engine(spark)
    op = "NOT IN" if neg else "IN"
    q = (
        f"SELECT id FROM {{t}} WHERE id {op} "
        f"(SELECT key FROM {{u}} WHERE {sub_where}) AND ({outer})"
    )
    got = sorted(
        r.id for r in eng.ref_sql(q.format(t="t", u="u")).collect()
    )
    want = sorted(
        r.id for r in spark.sql(q.format(t="fuzz_t", u="fuzz_u")).collect()
    )
    assert got == want, f"{q}: {got} != {want}"


# --- round-6 dialect surface: differential fuzz vs Spark SQL ---------------


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    w1=_where_exprs(),
    w2=_where_exprs(),
    w3=_where_exprs(),
    ops=st.lists(
        st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
        min_size=1,
        max_size=2,
    ),
    limit=st.integers(1, 8),
)
def test_refsql_setops_match_spark_sql(spark, w1, w2, w3, ops, limit):
    # The dialect folds set operations LEFT-ASSOCIATIVELY; Spark SQL gives
    # INTERSECT higher precedence, so the Spark side parenthesizes each
    # fold step explicitly to compare identical semantics.
    eng = _fuzz_engine(spark)
    wheres = [w1, w2, w3][: len(ops) + 1]
    ref = f"SELECT id FROM t WHERE {wheres[0]}"
    spk = f"SELECT id FROM fuzz_t WHERE {wheres[0]}"
    for op, w in zip(ops, wheres[1:]):
        ref += f" {op} SELECT id FROM t WHERE {w}"
        spk = f"({spk} {op} SELECT id FROM fuzz_t WHERE {w})"
    ref += f" ORDER BY id LIMIT {limit}"
    spk = f"SELECT * FROM ({spk}) ORDER BY id LIMIT {limit}"
    got = [r.id for r in eng.ref_sql(ref).collect()]
    want = [r.id for r in spark.sql(spk).collect()]
    assert got == want, f"{ref}: refsql {got} != spark {want}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    agg=st.sampled_from(["MIN(key)", "MAX(key)", "AVG(key)", "COUNT(*)"]),
    tag=st.sampled_from(["x", "y", "w", "nope"]),
    op=st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
)
def test_refsql_scalar_subquery_matches_spark_sql(spark, agg, tag, op):
    # Uncorrelated scalar subquery in a WHERE comparison: the dialect
    # inlines the executed value; Spark plans a native scalar subquery —
    # both must select the same rows (including the empty-subquery → NULL
    # → everything-filtered case for tag='nope').
    eng = _fuzz_engine(spark)
    sub = f"(SELECT {agg} FROM {{u}} WHERE tag = '{tag}')"
    got = sorted(
        r.id
        for r in eng.ref_sql(
            f"SELECT id FROM t WHERE id {op} {sub.format(u='u')}"
        ).collect()
    )
    want = sorted(
        r.id
        for r in spark.sql(
            f"SELECT id FROM fuzz_t WHERE id {op} {sub.format(u='fuzz_u')}"
        ).collect()
    )
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    mode=st.sampled_from(["ROLLUP", "CUBE"]),
    where=_where_exprs(),
    agg=st.sampled_from(["SUM(id)", "MIN(price)", "COUNT(*)"]),
)
def test_refsql_rollup_cube_match_spark_sql(spark, mode, where, agg):
    eng = _fuzz_engine(spark)

    def canon(rows):
        # Super-aggregate rows carry NULL keys; sort None-safely.
        return sorted(
            (tuple(r) for r in rows),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    got = canon(
        eng.ref_sql(
            f"SELECT flag, name, {agg} AS a FROM t WHERE {where} "
            f"GROUP BY {mode}(flag, name)"
        ).collect()
    )
    want = canon(
        spark.sql(
            f"SELECT flag, name, {agg} AS a FROM fuzz_t WHERE {where} "
            f"GROUP BY {mode}(flag, name)"
        ).collect()
    )
    assert got == want, f"{mode} {where}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lo=st.integers(0, 3),
    hi=st.sampled_from(["CURRENT ROW", "1 FOLLOWING", "UNBOUNDED FOLLOWING"]),
    fn=st.sampled_from(["SUM(price)", "MIN(id)", "COUNT(*)"]),
)
def test_refsql_window_frames_match_spark_sql(spark, lo, hi, fn):
    eng = _fuzz_engine(spark)
    lo_s = "UNBOUNDED PRECEDING" if lo == 3 else f"{lo} PRECEDING"
    over = (
        f"OVER (PARTITION BY flag ORDER BY id "
        f"ROWS BETWEEN {lo_s} AND {hi}) AS wv"
    )
    got = sorted(
        tuple(r)
        for r in eng.ref_sql(f"SELECT id, {fn} {over} FROM t").collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.sql(f"SELECT id, {fn} {over} FROM fuzz_t").collect()
    )
    assert got == want, f"{fn} {over}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    neg=st.booleans(),
    tag=st.sampled_from(["x", "y", "w", "nope"]),
    extra=st.sampled_from(["", " AND i.key > 1", " AND i.key < 9"]),
)
def test_refsql_exists_matches_spark_sql(spark, neg, tag, extra):
    # Correlated [NOT] EXISTS: identical alias-qualified text runs on both
    # engines (the dialect rewrites to semi/anti joins; Spark decorrelates
    # natively) — row sets must agree, including the empty-inner case.
    eng = _fuzz_engine(spark)
    kw = "NOT EXISTS" if neg else "EXISTS"
    body = f"(SELECT 1 FROM {{u}} AS i WHERE i.key = o.id AND i.tag = '{tag}'{extra})"
    got = sorted(
        r.id
        for r in eng.ref_sql(
            f"SELECT id FROM t AS o WHERE {kw} {body.format(u='u')}"
        ).collect()
    )
    want = sorted(
        r.id
        for r in spark.sql(
            f"SELECT id FROM fuzz_t AS o WHERE {kw} {body.format(u='fuzz_u')}"
        ).collect()
    )
    assert got == want, f"{kw} {body}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    where=_where_exprs(),
    agg=st.sampled_from(
        [
            "PERCENTILE(price, 0.5)",
            "MEDIAN(price)",
            "STDDEV(price)",
            "VARIANCE(id)",
            "CORR(id, price)",
        ]
    ),
)
def test_refsql_stat_aggs_match_spark_sql(spark, where, agg):
    # Statistical aggregates compile to the very same Catalyst functions
    # Spark SQL plans, so results must be bit-identical (no rounding) —
    # including runtime errors: under ANSI mode CORR over a single-row
    # group raises divide-by-zero on BOTH engines, which must agree too.
    eng = _fuzz_engine(spark)

    def run(df_fn):
        try:
            return sorted((r.flag, r.a) for r in df_fn().collect())
        except Exception:
            return "runtime-error"

    got = run(
        lambda: eng.ref_sql(
            f"SELECT flag, {agg} AS a FROM t WHERE {where} GROUP BY flag"
        )
    )
    want = run(
        lambda: spark.sql(
            f"SELECT flag, {agg} AS a FROM fuzz_t WHERE {where} GROUP BY flag"
        )
    )
    assert got == want, f"{agg} WHERE {where}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(w1=_where_exprs(), w2=_where_exprs(), limit=st.integers(1, 8))
def test_refsql_cte_matches_spark_sql(spark, w1, w2, limit):
    # WITH bodies and the outer SELECT must compose exactly like Spark
    # SQL's native CTE planning (same text modulo the view name).
    eng = _fuzz_engine(spark)
    tpl = (
        "WITH c AS (SELECT id, name, price, flag FROM {t} WHERE {w1}) "
        "SELECT id FROM c WHERE {w2} ORDER BY id LIMIT {n}"
    )
    got = [
        r.id
        for r in eng.ref_sql(tpl.format(t="t", w1=w1, w2=w2, n=limit)).collect()
    ]
    want = [
        r.id
        for r in spark.sql(
            tpl.format(t="fuzz_t", w1=w1, w2=w2, n=limit)
        ).collect()
    ]
    assert got == want, f"{w1} / {w2}"


# --- round-7 dialect surface: differential fuzz vs Spark SQL ----------------


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    where=_where_exprs(),
    agg=st.sampled_from(["SUM(id)", "MIN(price)", "COUNT(*)"]),
    ord_col=st.integers(1, 2),
    desc=st.booleans(),
)
def test_refsql_group_by_all_ordinals_match_spark_sql(
    spark, where, agg, ord_col, desc
):
    # GROUP BY ALL must equal an explicit GROUP BY over the non-aggregate
    # items, and ORDER BY ordinals must equal ordering by the named output
    # column (Spark SQL supports both natively — same text both sides,
    # except the dialect side exercises OUR parser).
    eng = _fuzz_engine(spark)
    d = "DESC" if desc else "ASC"
    got = [
        tuple(r)
        for r in eng.ref_sql(
            f"SELECT flag, name, {agg} AS a FROM t WHERE {where} "
            f"GROUP BY ALL ORDER BY {ord_col} {d}, 2, 1, a"
        ).collect()
    ]
    want = [
        tuple(r)
        for r in spark.sql(
            f"SELECT flag, name, {agg} AS a FROM fuzz_t WHERE {where} "
            f"GROUP BY ALL ORDER BY {ord_col} {d}, 2, 1, a"
        ).collect()
    ]
    assert got == want, f"{where} / {agg} / ORDER BY {ord_col} {d}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lo=st.integers(0, 3),
    hi=st.integers(0, 3),
    agg=st.sampled_from(["SUM", "COUNT", "MIN", "MAX", "AVG"]),
    kind=st.sampled_from(["ROWS", "RANGE"]),
)
def test_refsql_frames_match_spark_sql(spark, lo, hi, agg, kind):
    eng = _fuzz_engine(spark)
    frame = f"{kind} BETWEEN {lo} PRECEDING AND {hi} FOLLOWING"
    q = (
        f"SELECT id, {agg}(id) OVER (ORDER BY id {frame}) AS v "
        f"FROM {{t}} ORDER BY id"
    )
    got = [tuple(r) for r in eng.ref_sql(q.format(t="t")).collect()]
    want = [tuple(r) for r in spark.sql(q.format(t="fuzz_t")).collect()]
    assert got == want, frame


def test_feature_scalers_match_python_reference(spark):
    """Round-9 property test: the four feature scalers vs a plain
    numpy/statistics reference on randomized grouped data (including a
    constant group and a singleton group — the degenerate NULL cases)."""
    import random as _random
    import statistics as _stats

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        features,
    )

    rng = _random.Random(505)
    rows = []
    rid = 0
    for g, n in [("a", 37), ("b", 11), ("c", 1), ("d", 8)]:
        for _ in range(n):
            v = 7.0 if g == "d" else round(rng.uniform(-50, 150), 2)
            rows.append((rid, g, v))
            rid += 1
    df = spark.createDataFrame(rows, "id long, g string, v double")
    by_g = {}
    for _, g, v in rows:
        by_g.setdefault(g, []).append(v)

    mm = {r.id: r.scaled for r in features.minmax_scale(df, "v", ["g"]).collect()}
    zs = {r.id: r.scaled for r in features.zscore_scale(df, "v", ["g"]).collect()}
    rb = {r.id: r.scaled for r in features.robust_scale(df, "v", ["g"]).collect()}
    loo = {
        r.id: r.encoded
        for r in features.loo_target_encode(df, "g", "v", out_col="encoded").collect()
    }

    def q(vals, p):
        # exact interpolated quantile, the percentile/quantile_cont formula
        s = sorted(vals)
        pos = (len(s) - 1) * p
        lo = int(pos)
        frac = pos - lo
        return s[lo] if frac == 0 else s[lo] + frac * (s[lo + 1] - s[lo])

    for i, g, v in rows:
        vals = by_g[g]
        lo_v, hi_v = min(vals), max(vals)
        if hi_v > lo_v:
            assert mm[i] == round((v - lo_v) / (hi_v - lo_v), 4), (i, g)
        else:
            assert mm[i] is None
        if len(vals) > 1 and _stats.stdev(vals) > 0:
            want = round((v - _stats.mean(vals)) / _stats.stdev(vals), 4)
            assert abs(zs[i] - want) <= 1e-4, (i, g, zs[i], want)
        else:
            assert zs[i] is None
        iqr = q(vals, 0.75) - q(vals, 0.25)
        if iqr > 0:
            want = round((v - q(vals, 0.5)) / iqr, 4)
            assert abs(rb[i] - want) <= 1e-4, (i, g, rb[i], want)
        else:
            assert rb[i] is None
        if len(vals) > 1:
            want = round(sum(vals) - v, 2) / (len(vals) - 1)
            assert abs(loo[i] - want) <= 1e-9, (i, g)
        else:
            assert loo[i] is None


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    inner=st.sampled_from(
        ["SUM(id)", "AVG(id)", "COUNT(*)", "MIN(id)", "MAX(id)"]
    ),
    wrap=st.sampled_from(
        [
            "round({a}, 2)",
            "CAST({a} AS BIGINT)",
            "{a} + 1",
            "{a} * 2 - 1",
            "CAST(round({a}, 0) AS BIGINT)",
        ]
    ),
    grouped=st.booleans(),
)
def test_refsql_agg_wrapping_exprs_match_spark_sql(spark, inner, wrap, grouped):
    """Round-10: expressions wrapping aggregates route to the aggregate
    list and must match Spark SQL compiling the identical text."""
    eng = _fuzz_engine(spark)
    item = wrap.format(a=inner)
    group = " GROUP BY flag" if grouped else ""
    head = "flag, " if grouped else ""
    got_df = eng.ref_sql(f"SELECT {head}{item} AS a FROM t{group}")
    want_df = spark.sql(f"SELECT {head}{item} AS a FROM fuzz_t{group}")

    def key(rows):
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert key(got_df.collect()) == key(want_df.collect()), item


@SETTINGS
@given(
    keys=st.lists(st.integers(0, 5), min_size=1, max_size=60),
    top_k=st.integers(1, 8),
)
def test_skew_report_matches_counter_reference(spark, keys, top_k):
    """Round-11: skew_report ≡ a Counter-based python reference — counts,
    shares, ratios, heaviest-first order (key tiebreak), top_k bound."""
    from collections import Counter

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        skew,
    )

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = skew.skew_report(df, ["k"], top_k=top_k).collect()
    c = Counter(keys)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    assert [(r.k, r.n) for r in got] == want
    total, nkeys = len(keys), len(c)
    for r in got:
        assert r.share == r.n / total
        # divide-first association (overflow-safe at scale) — mirror it
        # exactly so the float comparison is bit-identical
        assert r.ratio_vs_mean == r.n / total * nkeys


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "ab", "xyz"]), max_size=24),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(2, 4),
)
def test_ngram_char_stats_matches_counter_reference(spark, docs, n):
    """Round-12: ngram_char_stats (sorted-runs F.aggregate fold) ≡ a
    Counter-based python reference on every field, including the
    whole-text short-doc collapse and the lexicographic top-gram
    tie-break."""
    from collections import Counter

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text,
    )

    rows = [(i, toks) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select(
            "doc_id", text.ngram_char_stats(F.col("toks"), n).alias("s")
        ).collect()
    }

    for i, toks in rows:
        joined = " ".join(toks)
        if len(toks) < n:
            grams = [joined]
        else:
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        c = Counter(grams)
        top_gram, top_count = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want = {
            "n_grams": len(grams),
            "total_chars": len(joined),
            "n_distinct": len(c),
            "top_gram": top_gram,
            "top_count": top_count,
            "top_chars": top_count * len(top_gram),
            "dup_occurrences": sum(v for v in c.values() if v >= 2),
            "dup_chars": sum(v * len(g) for g, v in c.items() if v >= 2),
        }
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["l1", "l2", "line three", ""]), max_size=16),
        min_size=1,
        max_size=8,
    )
)
def test_line_dup_stats_matches_counter_reference(spark, docs):
    """Round-12: line_dup_stats ≡ a Counter reference — blank lines drop,
    duplicate occurrences and characters count every repeated occurrence."""
    from collections import Counter

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators import (
        text,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.s.asDict()
        for r in df.select("doc_id", text.line_dup_stats("text").alias("s")).collect()
    }

    for i, lines in [(i, [x for x in ls if x]) for i, ls in enumerate(docs)]:
        c = Counter(lines)
        want = {
            "n_lines": len(lines),
            "n_distinct": len(c),
            "dup_occurrences": sum(v for v in c.values() if v >= 2),
            "dup_chars": sum(v * len(x) for x, v in c.items() if v >= 2),
            "total_chars": sum(len(x) for x in lines),
        }
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


@SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=18),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_duplicate_spans_matches_python_reference(spark, docs, k):
    """Round-12: duplicate_spans (exact-substring positional dedup, Lee
    et al. 2021) ≡ a Counter-based python reference — corpus-wide k-gram
    duplication incl. same-doc repeats, island merging at gap ≤ k,
    end-exclusive bounds, sub-k docs excluded."""
    from collections import Counter

    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        duplicate_spans,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicate_spans(df, "doc_id", "text", k=k).collect()
    )

    c: Counter = Counter()
    for toks in docs:
        for j in range(len(toks) - k + 1):
            c[tuple(toks[j : j + k])] += 1
    want = []
    for i, toks in enumerate(docs):
        dup_pos = [
            j
            for j in range(len(toks) - k + 1)
            if c[tuple(toks[j : j + k])] >= 2
        ]
        spans, start, prev = [], None, None
        for p in dup_pos:
            if start is None:
                start, prev = p, p
            elif p > prev + k:
                spans.append((start, prev + k))
                start, prev = p, p
            else:
                prev = p
        if start is not None:
            spans.append((start, prev + k))
        for s, e in spans:
            want.append((i, s, e, e - s))
    assert got == sorted(want), f"{got} != {sorted(want)}"


@SETTINGS
@given(
    train=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=16),
        min_size=1,
        max_size=5,
    ),
    ev=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=3,
    ),
    k=st.integers(2, 4),
)
def test_contaminated_spans_matches_python_reference(spark, train, ev, k):
    """Round-13: contaminated_spans (cross-corpus exact-substring
    decontamination) ≡ a set-based python reference — training k-grams
    marked iff present anywhere in the eval corpus, island merging at
    gap ≤ k, end-exclusive bounds, sub-k docs exempt, train-internal
    duplication ignored."""
    from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark.operators.dedup import (
        contaminated_spans,
    )

    tdf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(train)],
        "doc_id long, text string",
    )
    edf = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(ev)],
        "eval_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in contaminated_spans(tdf, edf, "doc_id", "text", k=k).collect()
    )

    egrams = {
        tuple(toks[j : j + k])
        for toks in ev
        for j in range(len(toks) - k + 1)
    }
    want = []
    for i, toks in enumerate(train):
        dup_pos = [
            j
            for j in range(len(toks) - k + 1)
            if tuple(toks[j : j + k]) in egrams
        ]
        spans, start, prev = [], None, None
        for p in dup_pos:
            if start is None:
                start, prev = p, p
            elif p > prev + k:
                spans.append((start, prev + k))
                start, prev = p, p
            else:
                prev = p
        if start is not None:
            spans.append((start, prev + k))
        for s, e in spans:
            want.append((i, s, e, e - s))
    assert got == sorted(want), f"{got} != {sorted(want)}"
