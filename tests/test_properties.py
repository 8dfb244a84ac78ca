"""Property-based tests (hypothesis) for scheme/batch invariants —
the reference checks exact sequences; we additionally check the
algebraic contracts hold for arbitrary shapes."""

from hypothesis import given, settings, strategies as st

from fuel_spark import schemes
from fuel_spark.ops import core
from fuel_spark.sources import from_rows

SET = settings(max_examples=8, deadline=None)


@given(n=st.integers(1, 40), bs=st.integers(1, 10), seed=st.integers(0, 5))
@SET
def test_shuffled_batches_partition_everything(spark, n, bs, seed):
    df = from_rows(spark, [(i,) for i in range(n)], schema="k bigint")
    out = schemes.shuffled_batches(df, "k", bs, seed=seed).collect()
    assert sorted(r.pos for r in out) == list(range(n))
    assert sorted(r.k for r in out) == list(range(n))
    for r in out:
        assert r.batch_id == r.pos // bs


@given(n=st.integers(1, 30), bs=st.integers(1, 8))
@SET
def test_pack_unpack_is_identity(spark, n, bs):
    df = from_rows(spark, [(i, i * 3) for i in range(n)], schema="k bigint, v bigint")
    b = schemes.sequential_batches(df, "k", bs)
    packed = core.pack_batches(b, "batch_id", ["k", "v"], order_within="k")
    unpacked = core.unpack_batches(packed, ["k", "v"])
    assert sorted((r.k, r.v) for r in unpacked.collect()) == [
        (i, i * 3) for i in range(n)
    ]


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
    orders=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
)
@SET
def test_asof_join_matches_reference_model(spark, events, orders):
    from pyspark.sql import functions as F

    from fuel_spark.ops import core

    e = from_rows(
        spark,
        [(i, k, t) for i, (k, t) in enumerate(events)],
        schema="eid bigint, k bigint, t bigint",
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")
    o = from_rows(
        spark,
        [(i, k, t) for i, (k, t) in enumerate(orders)],
        schema="oid bigint, k bigint, t bigint",
    ).withColumn("ts2", F.timestamp_seconds("t")).drop("t")
    got = {r.eid: r.oid for r in
           core.asof_join(e, o, "k", "ts", "ts2", ["oid"]).collect()}
    for i, (k, t) in enumerate(events):
        cands = [(ot, oi) for oi, (ok, ot) in enumerate(orders)
                 if ok == k and ot <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


def test_salted_sum_equals_direct(spark):
    from pyspark.sql import functions as F

    from fuel_spark.functions import salted_sum
    from fuel_spark.sources import load_tables

    l = load_tables(spark, "/root/testdata/sf0.001")["lineitem"]
    direct = {
        (r.l_returnflag, r.l_linestatus): (r.s, r.c)
        for r in l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
            .cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.sum_price, r.n_rows)
        for r in salted_sum(
            l, ["l_returnflag", "l_linestatus"],
            {"l_extendedprice": "sum_price"}, salt_buckets=16,
        ).collect()
    }
    assert direct == salted  # bit-identical: exact decimal partials


@given(k=st.integers(2, 6), n=st.integers(6, 50))
@SET
def test_cross_validation_covers_all(spark, k, n):
    df = from_rows(spark, [(i,) for i in range(n)], schema="k bigint")
    out = schemes.cross_validation_folds(df, "k", k).collect()
    assert len(out) == n
    folds = {r.fold for r in out}
    assert folds == set(range(k))  # every fold non-empty (n >= k guaranteed)


@given(
    f1=st.floats(0.0, 1.0), f2=st.floats(0.0, 1.0), seed=st.integers(0, 5)
)
@SET
def test_deterministic_sample_is_monotone_in_fraction(spark, f1, f2, seed):
    """sample(min(f1,f2)) is a subset of sample(max(f1,f2)) — the
    threshold rule makes fractions nested, so a pipeline can grow its
    sample without resampling old members."""
    lo, hi = sorted([f1, f2])
    df = from_rows(spark, [(i,) for i in range(300)], schema="k bigint")
    small = {r.k for r in
             schemes.deterministic_sample(df, "k", lo, seed=seed).collect()}
    big = {r.k for r in
           schemes.deterministic_sample(df, "k", hi, seed=seed).collect()}
    assert small <= big


@given(seed=st.integers(0, 5), extra=st.integers(1, 100))
@SET
def test_deterministic_sample_stable_under_growth(spark, seed, extra):
    """Membership of existing keys never changes when the corpus
    grows — the contract df.sample() cannot give."""
    base = from_rows(spark, [(i,) for i in range(200)], schema="k bigint")
    grown = from_rows(
        spark, [(i,) for i in range(200 + extra)], schema="k bigint"
    )
    a = {r.k for r in
         schemes.deterministic_sample(base, "k", 0.4, seed=seed).collect()}
    b = {r.k for r in
         schemes.deterministic_sample(grown, "k", 0.4, seed=seed).collect()}
    assert a == {k for k in b if k < 200}


@given(
    toks=st.lists(st.integers(1, 400), min_size=1, max_size=30),
    budget=st.integers(50, 400),
)
@SET
def test_pack_token_budget_local_invariants(spark, toks, budget):
    rows = [(i, t) for i, t in enumerate(toks)]
    df = from_rows(spark, rows, schema="doc_id bigint, tok bigint").repartition(1)
    packs = core.pack_token_budget_local(df, "doc_id", "tok", budget).collect()
    # every doc packed exactly once
    assert sorted(i for p in packs for i in p.doc_ids) == list(range(len(toks)))
    for p in packs:
        # greedy budget bound: only a single oversized doc may exceed
        assert p.n_tokens <= budget or p.n_docs == 1
        assert p.n_docs == len(p.doc_ids)
        assert p.n_tokens == sum(toks[i] for i in p.doc_ids)


@given(
    n=st.integers(1, 40),
    k=st.integers(1, 12),
    seed=st.integers(0, 3),
)
@SET
def test_sample_n_per_group_counts_and_stability(spark, n, k, seed):
    rows = [(i, "g" + str(i % 3)) for i in range(n)]
    df = from_rows(spark, rows, schema="key bigint, g string")
    out = schemes.sample_n_per_group(df, "g", k, "key", seed=seed).collect()
    sizes = {}
    for r in out:
        sizes[r.g] = sizes.get(r.g, 0) + 1
    from collections import Counter

    group_totals = Counter("g" + str(i % 3) for i in range(n))
    for g, total in group_totals.items():
        assert sizes.get(g, 0) == min(k, total)
    # sampled set is a subset and deterministic
    again = {r.key for r in
             schemes.sample_n_per_group(df, "g", k, "key", seed=seed).collect()}
    assert again == {r.key for r in out}


@given(
    n_words=st.integers(0, 30),
    chunk_size=st.integers(1, 10),
    stride=st.integers(1, 10),
)
@SET
def test_chunk_documents_matches_reference_model(spark, n_words, chunk_size, stride):
    """Chunking invariants vs a pure-Python reference: same windows,
    every token covered, every chunk contributes a new token."""
    from fuel_spark.ops.text import chunk_documents
    from fuel_spark.sources import from_rows

    words = [f"w{i}" for i in range(n_words)]
    df = from_rows(spark, [(1, " ".join(words))],
                   schema="doc_id bigint, text string")
    got = sorted(
        (r.chunk_id, r.start, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    )

    want = []
    for idx, start in enumerate(range(0, n_words, stride)):
        if start > 0 and start - stride + chunk_size >= n_words:
            break  # previous window already reached the end
        chunk = words[start:start + chunk_size]
        want.append((idx, start, len(chunk), " ".join(chunk)))
    assert got == want
    # full coverage holds iff windows overlap or abut (stride <=
    # chunk_size); a larger stride is deliberate gap-sampling
    if n_words and stride <= chunk_size:
        covered = set()
        for _, start, n, _ in want:
            covered.update(range(start, start + n))
        assert covered == set(range(n_words))


@given(
    points=st.lists(st.integers(0, 200), min_size=0, max_size=25),
    intervals=st.lists(
        st.tuples(st.integers(0, 200), st.integers(-30, 60)),
        min_size=1,
        max_size=10,
    ),
    width=st.sampled_from([1, 7, 10, 64]),
)
@SET
def test_range_join_matches_bruteforce_model(spark, points, intervals, width):
    """Bucketed range join == the O(n*m) reference model for any bucket
    width, including inverted and zero-length intervals."""
    pts = [{"pid": i, "x": float(v)} for i, v in enumerate(points)]
    ivs = [
        {"iid": i, "s": float(a), "e": float(a + d)}
        for i, (a, d) in enumerate(intervals)
    ]
    want = {
        (iv["iid"], p["pid"])
        for iv in ivs
        for p in pts
        if iv["s"] <= p["x"] <= iv["e"]
    }
    if not pts:
        pts_df = spark.createDataFrame([], schema="pid bigint, x double")
    else:
        pts_df = from_rows(spark, pts)
    got = {
        (r.iid, r.pid)
        for r in core.range_join(
            pts_df, from_rows(spark, ivs), "x", "s", "e", bucket_width=width
        ).collect()
    }
    assert got == want


def test_canonical_url_idempotent_and_variant_invariant(spark):
    """Property: canonicalization is idempotent, and the standard
    crawl-noise transforms (scheme/www/trailing-slash/fragment/
    tracking params/param order) never change the canonical form."""
    from fuel_spark.ops.text import canonical_url
    from fuel_spark.sources import from_rows
    from pyspark.sql import functions as F

    bases = [
        "example.com/a/b?q=1&x=2",
        "site.org/path",
        "a.b.c.net/deep/path/here?z=9",
    ]
    variants = []
    for i, b in enumerate(bases):
        sep = "&" if "?" in b else "?"
        variants += [
            (i, f"http://{b}"),
            (i, f"https://www.{b}"),
            (i, f"HTTPS://WWW.{b}#frag"),
            (i, f"https://{b}{sep}utm_source=x&utm_medium=y"),
        ]
        if "?" not in b:
            variants.append((i, f"http://{b}/"))
    df = from_rows(spark, variants, "grp bigint, url string")
    out = df.select(
        "grp", canonical_url(F.col("url")).alias("c")
    ).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, set()).add(r.c)
    for grp, forms in by_grp.items():
        assert len(forms) == 1, (grp, forms)
    # idempotence: canonicalizing the canonical form is a fixpoint
    canon = df.select(canonical_url(F.col("url")).alias("url"))
    twice = canon.select(canonical_url(F.col("url")).alias("c2")).collect()
    once = canon.collect()
    assert sorted(r.url for r in once) == sorted(r.c2 for r in twice)


def test_parallel_ntile_bucket_sizes_property(spark):
    """Property over many (n, k): bucket sizes differ by at most one,
    big buckets come first, and all n rows are covered."""
    from fuel_spark.ops.core import parallel_ntile
    from pyspark.sql import functions as F

    for n, k in [(1, 5), (7, 3), (64, 8), (100, 7)]:
        df = spark.range(n).select((F.col("id") * 13 % n).alias("v"), "id")
        rows = parallel_ntile(df, [F.col("v"), F.col("id")], k, "b").collect()
        sizes = {}
        for r in rows:
            sizes[r.b] = sizes.get(r.b, 0) + 1
        assert sum(sizes.values()) == n
        vals = [sizes[b] for b in sorted(sizes)]
        assert max(vals) - min(vals) <= 1
        assert vals == sorted(vals, reverse=True)


@given(n_parts=st.integers(min_value=1, max_value=6))
@settings(max_examples=4, deadline=None)
def test_weighted_sample_partition_invariant(spark, n_parts):
    """The Efraimidis–Spirakis winners depend only on (seed, key,
    weight) — repartitioning must not change them."""
    from fuel_spark.schemes import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(80)]
    df = from_rows(spark, rows, schema="k bigint, w double")
    base = sorted(r.k for r in weighted_sample(df, "k", "w", n=12).collect())
    got = sorted(
        r.k
        for r in weighted_sample(
            df.repartition(n_parts), "k", "w", n=12
        ).collect()
    )
    assert got == base


@given(n_parts=st.integers(min_value=2, max_value=5))
@settings(max_examples=4, deadline=None)
def test_curriculum_positions_are_permutation(spark, n_parts):
    """Curriculum positions are a 0..n-1 permutation under any
    partitioning, with difficulty monotone along positions."""
    from fuel_spark.schemes import curriculum_batches

    rows = [(i, float((i * 13) % 11)) for i in range(70)]
    df = from_rows(spark, rows, schema="k bigint, d double").repartition(
        n_parts
    )
    out = sorted(
        curriculum_batches(df, "k", "d", batch_size=16).collect(),
        key=lambda r: r.pos,
    )
    assert [r.pos for r in out] == list(range(70))
    diffs = [r.d for r in out]
    assert diffs == sorted(diffs)


@given(
    lead_a=st.integers(0, 6),
    lead_b=st.integers(0, 6),
    span_len=st.integers(10, 16),
    seed=st.integers(0, 10_000),
)
@SET
def test_exact_substring_spans_matches_planted_duplicate(
    spark, lead_a, lead_b, span_len, seed
):
    """Plant one shared span of known length at known offsets inside
    two documents of otherwise-unique words: the operator must report
    exactly that span, at exactly those coordinates, and nothing for
    an unrelated third document."""
    import random

    from fuel_spark.ops import dedup

    rng = random.Random(seed)
    # unique word pools: wN tokens never collide across docs/sections
    uid = iter(f"u{rng.randrange(10**9)}x{i}" for i in range(200))
    shared = [f"s{seed}w{i}" for i in range(span_len)]
    doc_a = [next(uid) for _ in range(lead_a)] + shared + [next(uid) for _ in range(3)]
    doc_b = [next(uid) for _ in range(lead_b)] + shared + [next(uid) for _ in range(2)]
    doc_c = [next(uid) for _ in range(12)]
    df = from_rows(
        spark,
        [(1, " ".join(doc_a)), (2, " ".join(doc_b)), (3, " ".join(doc_c))],
        schema="doc_id bigint, text string",
    )
    spans = dedup.exact_substring_spans(
        df, "doc_id", "text", min_len=10, seed_k=5
    ).collect()
    assert len(spans) == 1
    r = spans[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert (r.start_a, r.start_b) == (lead_a + 1, lead_b + 1)
    assert r.span_words == span_len
