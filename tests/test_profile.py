"""Data-quality profiling / expectations / JSONL source tests."""

from fuel_spark.ops import profile
from fuel_spark.sources import (
    corrupt_split,
    from_rows,
    read_jsonl_corpus,
    write_jsonl,
)


def _frame(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "a"),
        (3, 40.0, None),
    ]
    return from_rows(spark, rows, schema="k bigint, v double, s string")


def test_profile_columns_hand_counts(spark):
    out = {r.column: r for r in profile.profile_columns(_frame(spark)).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_null == 0
    assert out["k"].n_distinct == 3
    assert out["v"].n_null == 1 and out["v"].n_distinct == 3
    assert out["v"].min_value == "10.0" and out["v"].max_value == "40.0"
    assert abs(out["v"].mean - (70.0 / 3)) < 1e-6
    assert out["s"].mean is None  # non-numeric: no mean
    assert out["s"].n_null == 1


def test_profile_approx_distinct_tier(spark):
    """The 100 TB tier: approx_count_distinct instead of the exact
    distinct expand.  Same schema, same counts on a small frame (HLL
    is exact at these cardinalities), still one aggregation pass."""
    out = {
        r.column: r
        for r in profile.profile_columns(
            _frame(spark), exact_distinct=False
        ).collect()
    }
    assert set(out) == {"k", "v", "s"}
    assert out["k"].n_rows == 4 and out["k"].n_distinct == 3
    assert out["v"].n_distinct == 3 and out["s"].n_distinct == 2
    plan = (
        profile.profile_columns(_frame(spark), exact_distinct=False)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the exact tier needs a distinct Expand; the approx tier must not
    assert "expand" not in plan.lower()


def test_profile_single_pass(spark):
    # the whole profile must compile to ONE aggregate over the input —
    # no per-column jobs
    plan = profile.profile_columns(_frame(spark))._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("localrelation") + plan.lower().count("scan") <= 1


def test_check_expectations_counts(spark):
    out = {r.rule: r for r in profile.check_expectations(
        _frame(spark),
        [
            ("k_unique", "unique", "k"),
            ("v_not_null", "not_null", "v"),
            ("v_range", "between", "v", 0.0, 25.0),
            ("s_in_set", "in_set", "s", ["a", "b"]),
            ("k_non_negative", "non_negative", "k"),
            ("s_format", "matches", "s", "[a-z]"),
        ],
    ).collect()}
    assert out["k_unique"].n_violations == 1 and not out["k_unique"].passed
    assert out["v_not_null"].n_violations == 1
    # 40.0 out of range + NULL violates => 2
    assert out["v_range"].n_violations == 2
    assert out["s_in_set"].n_violations == 1  # the NULL
    assert out["k_non_negative"].passed
    assert out["s_format"].n_violations == 1  # NULL fails the regex


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    d = from_rows(
        spark,
        [(1, "hello world", "en", "web", 11), (2, "bonjour", "fr", "book", 7)],
        schema="doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    path = str(tmp_path / "corpus")
    write_jsonl(d, path, partitions=1)
    back = read_jsonl_corpus(spark, path)
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "hello world"), (2, "bonjour"),
    ]
    # plant a corrupt line alongside the good shards
    (tmp_path / "corpus" / "zz_bad.json").write_text('{"doc_id": broken\n')
    df = read_jsonl_corpus(spark, path, keep_corrupt=True)
    good, bad = corrupt_split(df)
    assert good.count() == 2
    assert bad.count() == 1


def test_quantile_bins_equal_frequency(spark):
    """100 distinct uniform values, k=10 -> ten bins of ten; bin
    edges follow the ties-go-up [cut, next) convention."""
    from fuel_spark.ops.profile import quantile_bins
    from fuel_spark.sources import from_rows

    rows = [{"v": float(i)} for i in range(100)]
    out = {r.bin: (r.n, r.min_value, r.max_value)
           for r in quantile_bins(from_rows(spark, rows), "v", k=10).collect()}
    assert set(out) == set(range(10))
    assert sum(n for n, _, _ in out.values()) == 100
    # every bin holds ~10 of 100 uniform values (interpolated cuts
    # can shift one value across an edge)
    assert all(8 <= n <= 12 for n, _, _ in out.values())
    # bins tile the range in order
    order = [out[b] for b in range(10)]
    assert all(order[i][2] < order[i + 1][1] for i in range(9))


def test_key_skew_hand_computed_and_takeordered_plan(spark):
    """A planted hot key dominates with the right ratio, and the top-n
    runs as a distributed TakeOrdered, not a global window sort."""
    from fuel_spark.ops.profile import key_skew
    from fuel_spark.sources import from_rows

    rows = [{"k": 1} for _ in range(80)] + [{"k": i} for i in range(2, 22)]
    out = key_skew(from_rows(spark, rows), "k", top_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan
    got = {r.rank: (r.key, r.n_rows, r.skew_ratio) for r in out.collect()}
    # 100 rows, 21 distinct keys; hot key holds 80 rows
    assert got[1] == ("1", 80, round(80 * 21 / 100.0, 6))
    assert got[2][1] == 1


def test_read_csv_corpus_quarantine(spark, tmp_path):
    from fuel_spark.sources import corrupt_split, read_csv_corpus

    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('1,hello world,en,web,11\n')
        f.write('2,ok text,en,web,7\n')
        f.write('bad row with no commas that fit schema\n')
    df = read_csv_corpus(spark, p, keep_corrupt=True)
    good, bad = corrupt_split(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    clean = read_csv_corpus(spark, p)
    assert clean.count() == 2


def test_check_referential_orphans(spark):
    from fuel_spark.ops.profile import check_referential

    parent = from_rows(spark, [(1,), (2,)], schema="pk bigint")
    child = from_rows(spark, [(1,), (1,), (3,), (4,)], schema="fk bigint")
    out = {r.rule: (r.n_orphans, r.passed) for r in check_referential([
        ("ok", parent, "pk", parent, "pk"),
        ("orphans", child, "fk", parent, "pk"),
    ]).collect()}
    assert out["ok"] == (0, True)
    assert out["orphans"] == (2, False)  # rows 3 and 4


def test_schema_diff_statuses(spark):
    from fuel_spark.ops.profile import schema_diff

    old = from_rows(spark, [(1, "a", 1.0)], schema="k bigint, s string, v double")
    new = from_rows(spark, [(1, "a", 2, "x")], schema="k bigint, s string, v int, extra string")
    got = {c: (st, o, n) for c, st, o, n in schema_diff(old, new)}
    assert got["k"] == ("same", "bigint", "bigint")
    assert got["v"] == ("retyped", "double", "int")
    assert got["extra"] == ("added", None, "string")
    old2 = from_rows(spark, [(1, 1)], schema="k bigint, gone bigint")
    got2 = {c: st for c, st, _, _ in schema_diff(old2, new)}
    assert got2["gone"] == "removed"


def test_winsorize_clips_and_flags(spark):
    from fuel_spark.ops.profile import winsorize

    rows = [(i, float(i)) for i in range(1, 100)] + [(100, 10000.0)]
    df = from_rows(spark, rows, schema="k bigint, v double")
    out = {r.k: (r.v_winsorized, r.was_clipped) for r in
           winsorize(df, "v", 0.01, 0.99, out_col="v_winsorized").collect()}
    assert out[100][1] is True            # the fat finger clips
    assert out[100][0] < 10000.0
    assert out[50] == (50.0, False)       # interior untouched
    n_clipped = sum(1 for v, c in out.values() if c)
    assert 1 <= n_clipped <= 4            # ~1% each tail


def test_trend_by_group_exact_line(spark):
    """Points exactly on y = 3x + 7 recover slope/intercept/r2=1;
    a constant-x group degenerates to NULL slope."""
    from fuel_spark.ops.profile import trend_by_group

    rows = [("line", float(x), 3.0 * x + 7.0) for x in range(10)]
    rows += [("flat", 5.0, float(y)) for y in range(5)]
    df = from_rows(spark, rows, schema="g string, x double, y double")
    out = {r.g: (r.slope, r.intercept, r.r2) for r in
           trend_by_group(df, "x", "y", group_col="g").collect()}
    assert out["line"] == (3.0, 7.0, 1.0)
    assert out["flat"] == (None, None, None)


def test_binary_auc_known_values(spark):
    from pyspark.sql import functions as F

    from fuel_spark.ops.profile import binary_auc

    # perfect separation
    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, ["score", "y"])
    r = binary_auc(df, "score", F.col("y") == 1).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    # one inversion among 2x2 pairs -> AUC = 3/4; plus a tie -> 0.5 credit
    rows2 = [(0.9, 1), (0.3, 1), (0.5, 0), (0.1, 0)]
    r2 = binary_auc(spark.createDataFrame(rows2, ["score", "y"]),
                    "score", F.col("y") == 1).collect()[0]
    assert r2.auc == 0.75
    rows3 = [(0.5, 1), (0.5, 0)]  # pure tie
    r3 = binary_auc(spark.createDataFrame(rows3, ["score", "y"]),
                    "score", F.col("y") == 1).collect()[0]
    assert r3.auc == 0.5


def test_cohen_kappa_extremes(spark):
    from fuel_spark.ops.profile import cohen_kappa

    perfect = spark.createDataFrame(
        [("a", "a")] * 5 + [("b", "b")] * 5, ["x", "y"])
    r = cohen_kappa(perfect, "x", "y").collect()[0]
    assert r.po == 1.0 and r.kappa == 1.0
    # independent with uniform marginals: po = 0.5 = pe -> kappa 0
    indep = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 3, ["x", "y"])
    r2 = cohen_kappa(indep, "x", "y").collect()[0]
    assert abs(r2.kappa) < 1e-6


def test_mutual_information_extremes(spark):
    from fuel_spark.ops.profile import mutual_information

    # identical columns: MI == H(X), NMI == 1
    import math
    same = spark.createDataFrame(
        [("a", "a")] * 6 + [("b", "b")] * 2, ["x", "y"])
    r = mutual_information(same, "x", "y").collect()[0]
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(r.mi - h) < 1e-5 and abs(r.nmi - 1.0) < 1e-5
    # independent: MI ~ 0
    indep = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 4, ["x", "y"])
    r2 = mutual_information(indep, "x", "y").collect()[0]
    assert abs(r2.mi) < 1e-6


def test_calibration_bins_perfect_and_miscalibrated(spark):
    """A perfectly calibrated score (pos_rate == score in every bin)
    reads ECE 0; a constant 0.9 score on all-negative labels reads
    ECE 0.9 in the top bin."""
    from pyspark.sql import functions as F

    # bin 0.05: 1 of 20 positive; bin 0.55: 11 of 20 positive
    rows = [(0.05, 1 if i < 1 else 0) for i in range(20)]
    rows += [(0.55, 1 if i < 11 else 0) for i in range(20)]
    df = from_rows(spark, rows, schema="score double, y int")
    out = {r.bin: r for r in profile.calibration_bins(
        df, "score", F.col("y") == 1, n_bins=10).collect()}
    assert set(out) == {0, 5}
    assert out[0].mean_score == 0.05 and out[0].pos_rate == 0.05
    assert out[5].mean_score == 0.55 and out[5].pos_rate == 0.55
    assert all(r.ece == 0.0 and r.abs_gap == 0.0 for r in out.values())

    bad = from_rows(spark, [(0.9, 0)] * 10, schema="score double, y int")
    r = profile.calibration_bins(bad, "score", F.col("y") == 1).first()
    assert r.bin == 9 and r.pos_rate == 0.0 and r.ece == 0.9


def test_calibration_bins_top_edge_and_ece_weighting(spark):
    """score=1.0 lands in the last bin (no bin 10); ECE weights gaps
    by bin mass: 30 rows gap 0 + 10 rows gap 0.5 -> ECE 0.125."""
    from pyspark.sql import functions as F

    rows = [(1.0, 1)] * 30 + [(0.5, 1)] * 10
    df = from_rows(spark, rows, schema="score double, y int")
    out = {r.bin: r for r in profile.calibration_bins(
        df, "score", F.col("y") == 1).collect()}
    assert set(out) == {5, 9}
    assert out[9].abs_gap == 0.0
    assert out[5].abs_gap == 0.5
    assert out[5].ece == 0.125


# ---------------------------------------------------------------------------
# round 9: catalog-profiling tier
# ---------------------------------------------------------------------------


def test_top_values_rank_and_tiebreak(spark):
    df = from_rows(
        spark, [("a",), ("a",), ("b",), ("b",), ("c",)], schema="k string"
    )
    out = [(r.value, r.cnt, r.rnk) for r in profile.top_values(
        df, ["k"], k=2, table="t").orderBy("rnk").collect()]
    # a and b tie at 2 -> value ASC breaks the tie deterministically
    assert out == [("a", 2, 1), ("b", 2, 2)]


def test_fd_violations_holds_and_fails(spark):
    df = from_rows(
        spark,
        [(1, "x"), (1, "x"), (2, "y"), (2, "z")],
        schema="k bigint, v string",
    )
    out = {r.rule: r for r in profile.fd_violations(
        df, [("kv", "k", "v")]).collect()}
    r = out["kv"]
    assert (r.n_keys, r.n_violating_keys, r.max_rhs_variants, r.holds) == (
        2, 1, 2, False)


def test_duplicate_row_stats_exact(spark):
    df = from_rows(
        spark, [(1, "a"), (1, "a"), (2, "b")], schema="k bigint, v string"
    )
    r = profile.duplicate_row_stats(df, ["k", "v"], "t").first()
    assert (r.n_rows, r.n_distinct, r.n_dup_rows) == (3, 2, 1)


def test_iqr_outlier_stats_exact_rank_quartiles(spark):
    # 1..8 plus one far outlier: n=9, q1 = 3rd smallest (ceil(9/4)=3),
    # q3 = 7th smallest (ceil(27/4)=7) -> q1=3, q3=7, iqr=4,
    # fences -3 / 13 -> exactly the 100 is high
    vals = [(float(v),) for v in (1, 2, 3, 4, 5, 6, 7, 8, 100)]
    df = from_rows(spark, vals, schema="v double")
    r = profile.iqr_outlier_stats(df, "v").first()
    assert (r.n, r.q1, r.q3, r.n_low, r.n_high) == (9, 3.0, 7.0, 0, 1)


def test_modal_coverage_three_way(spark):
    a = from_rows(spark, [(1,), (2,), (3,)], schema="id bigint")
    b = from_rows(spark, [(2,), (3,), (4,), (5,)], schema="id bigint")
    out = {r.status: r.n_ids for r in
           profile.modal_coverage(a, "id", b, "id").collect()}
    assert out == {"both": 2, "a_only": 1, "b_only": 2}


def test_date_coverage_gap_days(spark):
    from pyspark.sql import functions as F

    df = from_rows(
        spark,
        [("2024-01-01",), ("2024-01-02",), ("2024-01-05",)],
        schema="d string",
    )
    r = profile.date_coverage(df, F.col("d"), "t").first()
    assert (r.min_d, r.max_d) == ("2024-01-01", "2024-01-05")
    assert (r.days_present, r.span_days, r.gap_days) == (3, 5, 2)


def test_categorical_entropy_uniform_and_constant(spark):
    df = from_rows(
        spark,
        [("a", "x"), ("b", "x"), ("c", "x"), ("d", "x")],
        schema="u string, k string",
    )
    out = {r["column"]: r for r in profile.categorical_entropy(
        df, ["u", "k"], "t").collect()}
    assert out["u"].entropy_bits == 2.0   # uniform over 4 -> 2 bits
    assert out["k"].entropy_bits == 0.0   # constant -> 0 bits
    assert out["u"].n_distinct == 4 and out["k"].n_distinct == 1


def test_constancy_flags_near_constant(spark):
    rows = [("x",)] * 99 + [("y",)]
    df = from_rows(spark, rows, schema="k string")
    r = profile.constancy(df, ["k"], "t").first()
    assert r.top1_share == 0.99 and bool(r.near_constant)


def test_row_width_estimate_exact(spark):
    from pyspark.sql import functions as F

    df = from_rows(spark, [("ab",), ("abcd",)], schema="t string")
    r = profile.row_width_estimate(
        df, F.length("t") + F.lit(8), "t").first()
    assert (r.n_rows, r.total_bytes, r.mean_row_bytes) == (2, 22, 11.0)


def test_pearson_pairs_exact_signs(spark):
    rows = [(float(i), float(2 * i), float(10 - i)) for i in range(10)]
    df = from_rows(spark, rows, schema="a double, b double, c double")
    out = {(r.col_x, r.col_y): r.pearson_r for r in profile.pearson_pairs(
        df, [("a", "b"), ("a", "c")]).collect()}
    assert out[("a", "b")] == 1.0   # perfectly linear
    assert out[("a", "c")] == -1.0  # perfectly anti-linear


# ---- r10 catalog round-out -------------------------------------------------


def test_key_uniqueness_verdicts(spark):
    from fuel_spark.ops import profile
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark, [(1, 10), (2, 10), (3, 20)], schema="a bigint, b bigint"
    )
    rows = {r.candidate: r for r in profile.key_uniqueness([
        ("t", "a", df.select("a")),
        ("t", "b", df.select("b")),
        ("t", "a,b", df.select("a", "b")),
    ]).collect()}
    assert rows["a"].is_key and rows["a"].n_dup_rows == 0
    assert not rows["b"].is_key and rows["b"].n_dup_rows == 1
    assert rows["a,b"].is_key


def test_dtype_inference_rates(spark):
    from fuel_spark.ops import profile
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark,
        [("c", "123"), ("c", "4.5"), ("c", "2024-01-02"),
         ("c", "word"), ("c", "")],
        schema="col_name string, val string",
    )
    r = profile.dtype_inference(df).collect()[0]
    assert r.n_values == 5
    assert r.int_rate == 0.2       # '123'
    assert r.double_rate == 0.4    # '123' and '4.5'
    assert r.date_rate == 0.2 and r.empty_rate == 0.2


def test_group_sortedness_fraction(spark):
    from fuel_spark.ops import profile
    from fuel_spark.sources import from_rows

    # group 1: 3 pairs, values sorted; group 2: 1 pair, descending
    rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 20.0), (1, 4, 30.0),
            (2, 1, 9.0), (2, 2, 5.0)]
    df = from_rows(spark, rows, schema="g bigint, o bigint, v double")
    r = profile.group_sortedness(df, "g", ["o"], ["v"]).collect()[0]
    assert (r.n_pairs, r.n_sorted) == (4, 3)
    assert r.sorted_fraction == 0.75


def test_mask_census_collapse(spark):
    from fuel_spark.ops import profile
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark,
        [("c", "Customer#000042"), ("c", "Customer#000043"), ("c", "x9y")],
        schema="col_name string, val string",
    )
    rows = {r.mask: r for r in profile.mask_census(df).collect()}
    assert rows["Aa#9"].n_values == 2 and rows["Aa#9"].rank == 1
    assert rows["a9a"].n_values == 1


def test_extreme_rows_ranks_and_ties(spark):
    from fuel_spark.ops import profile
    from fuel_spark.sources import from_rows

    df = from_rows(
        spark, [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)],
        schema="id bigint, v double",
    )
    out = profile.extreme_rows([("v", df, "v", "id")], k=2).collect()
    top = {r.rank: r for r in out if r.direction == "top"}
    bot = {r.rank: r for r in out if r.direction == "bottom"}
    # tie at 9.0 breaks on id: row 2 before row 3
    assert (top[1].row_id, top[2].row_id) == (2, 3)
    assert (bot[1].row_id, bot[1].value) == (4, 1.0)
