"""Fellegi–Sunter record linkage: blocking recall, cap behavior,
weight arithmetic, threshold classification."""

import math

from pyspark.sql import functions as F

from fuel_spark.ops import linkage
from fuel_spark.sources import from_rows

L_SCHEMA = "l_id bigint, l_nation int, l_bal double"
R_SCHEMA = "r_id bigint, r_nation int, r_bal double"


def test_two_pass_blocking_catches_band_boundary_pairs(spark):
    # bal 249.9 vs 250.1 straddle the 0-offset band edge (bands are
    # [0,250) over bal+1000): a single-pass grid splits them, the
    # offset pass co-blocks them
    l = from_rows(spark, [(1, 5, 249.9)], schema=L_SCHEMA)
    r = from_rows(spark, [(11, 5, 250.1)], schema=R_SCHEMA)
    got = linkage.fs_candidate_pairs(l, r).collect()
    assert len(got) == 1
    row = got[0]
    assert row.a_bal and row.a_id and row.a_sign  # 1%10 == 11%10


def test_blocking_never_crosses_nations_and_dedups_passes(spark):
    l = from_rows(spark, [(1, 5, 100.0), (2, 6, 100.0)], schema=L_SCHEMA)
    r = from_rows(spark, [(11, 5, 100.0), (12, 6, 100.0)], schema=R_SCHEMA)
    got = linkage.fs_candidate_pairs(l, r).collect()
    # same (nation, band) in BOTH passes -> still exactly one pair row
    assert sorted((g.l_id, g.r_id) for g in got) == [(1, 11), (2, 12)]


def test_max_block_drops_pathological_blocks(spark):
    rows = [(i, 5, 100.0) for i in range(100)]
    l = from_rows(spark, rows, schema=L_SCHEMA)
    r = from_rows(spark, [(7, 5, 100.0)], schema=R_SCHEMA)
    capped = linkage.fs_candidate_pairs(l, r, max_block=50).collect()
    assert capped == []
    uncapped = linkage.fs_candidate_pairs(l, r).collect()
    assert len(uncapped) == 100


def test_fs_weights_match_closed_form_and_threshold(spark):
    w = linkage.fs_weight_literals()
    assert math.isclose(w["bal"][0], math.log2(0.90 / 0.05), abs_tol=1e-6)
    assert math.isclose(w["id"][1], math.log2(0.05 / 0.90), abs_tol=1e-6)
    # all-agree pair clears 5.0; bal+sign without id does not
    l = from_rows(spark, [(10, 5, 100.0), (21, 5, 110.0)], schema=L_SCHEMA)
    r = from_rows(spark, [(20, 5, 105.0)], schema=R_SCHEMA)
    pairs = linkage.fs_candidate_pairs(l, r)
    pats = {
        (p.a_bal, p.a_id, p.a_sign): p.weight
        for p in linkage.fs_pattern_summary(pairs).collect()
    }
    full = round(sum(w[f][0] for f in ("bal", "id", "sign")), 6)
    assert pats[(True, True, True)] == full
    matches = linkage.fs_matches(pairs, threshold=5.0).collect()
    assert [(m.l_id, m.r_id) for m in matches] == [(10, 20)]
    # pattern histogram counts cover every candidate pair
    n_pat = sum(
        p.n_pairs for p in linkage.fs_pattern_summary(pairs).collect()
    )
    assert n_pat == pairs.count()


def test_entity_clusters_merge_transitive_links(spark):
    # l2 links to BOTH r1 and r2; l1 links to r1 -> one entity of 4
    # members; l9-r9 is a separate entity of 2
    m = from_rows(
        spark,
        [(1, 1), (2, 1), (2, 2), (9, 9)],
        schema="l_id bigint, r_id bigint",
    )
    out = {r.entity_id: r for r in linkage.fs_entity_clusters(m).collect()}
    assert len(out) == 2
    big = out[2]          # min namespaced vertex: l1 -> 2
    assert big.n_members == 4 and big.n_left == 2 and big.n_right == 2
    small = out[18]       # l9 -> 18
    assert small.n_members == 2 and small.n_left == 1 and small.n_right == 1


def test_entity_clusters_namespace_same_numeric_ids(spark):
    # l_id 5 and r_id 5 are DIFFERENT entities' keys: the namespacing
    # must keep a (5, 7) link from colliding with a (9, 5) link
    m = from_rows(spark, [(5, 7), (9, 5)], schema="l_id bigint, r_id bigint")
    out = linkage.fs_entity_clusters(m).collect()
    assert len(out) == 2
    assert sorted(r.n_members for r in out) == [2, 2]


def test_linkage_summary_stages_are_consistent(spark):
    l = from_rows(
        spark,
        [(10, 5, 100.0), (21, 5, 110.0), (30, 6, -50.0)],
        schema="l_id bigint, l_nation int, l_bal double",
    )
    r = from_rows(
        spark,
        [(20, 5, 105.0), (31, 6, -60.0)],
        schema="r_id bigint, r_nation int, r_bal double",
    )
    got = {row.stage_name: row.n
           for row in linkage.fs_linkage_summary(l, r).collect()}
    assert got["left_rows"] == 3 and got["right_rows"] == 2
    assert got["candidate_pairs"] >= got["pairs_bal_agree"]
    assert got["candidate_pairs"] >= got["links"]
    # every link lands in exactly one entity; entities never exceed links
    assert got["entities"] <= got["links"] or got["links"] == 0
    assert got["multi_member_entities"] <= got["entities"]
    assert got["links"] >= 1            # (10, 20) all-agree pair


def test_fs_incremental_summary_ledger(spark):
    """The ingest audit adds up: matched + unmatched = new_batch, and
    a batch with a guaranteed hit (a supplier row cloned from a
    registry-adjacent profile) attaches while an out-of-band one
    opens a new entity."""
    reg = from_rows(
        spark,
        # nation 1, balances spread; l_id % 10 matters for a_id
        [(10, 1, 100.0), (21, 1, 500.0), (32, 1, 900.0)],
        schema="l_id bigint, l_nation int, l_bal double",
    )
    newb = from_rows(
        spark,
        [
            (40, 1, 101.0),   # same block as l_id=10, |Δbal|<=50, 0==0 id
            (55, 2, 100.0),   # nation 2: no block partner -> unmatched
        ],
        schema="r_id bigint, r_nation int, r_bal double",
    )
    got = {r.stage_name: r.n for r in
           linkage.fs_incremental_summary(reg, newb, threshold=5.0)
           .collect()}
    assert got["registry_rows"] == 3 and got["new_batch"] == 2
    assert got["matched_new"] + got["unmatched_new"] == got["new_batch"]
    assert got["matched_new"] == 1 and got["unmatched_new"] == 1
    assert got["entities_touched"] == 1
