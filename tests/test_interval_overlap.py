from __future__ import annotations

import itertools
import random

from zparse_spark.operators.asof import interval_overlap_join


def _brute(rows):
    # rows: (id, s, e) — valid intervals only
    out = set()
    for (ia, sa, ea), (ib, sb, eb) in itertools.combinations(
        sorted(rows), 2
    ):
        if max(sa, sb) <= min(ea, eb):
            out.add((ia, ib, max(sa, sb), min(ea, eb)))
    return out


def _got(df):
    return {
        (r.id_a, r.id_b, r.overlap_start, r.overlap_end) for r in df.collect()
    }


def test_boundary_touch_and_containment(spark):
    rows = [
        ("a", 0, 10),
        ("b", 10, 20),   # touches a at 10 — closed ends overlap
        ("c", 21, 30),   # disjoint from b by 1
        ("d", 2, 5),     # contained in a
        ("e", 5, 5),     # zero-length, inside a and d's boundary
    ]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    got = _got(interval_overlap_join(df, "id", "s", "e", bin_width=4))
    assert got == _brute(rows)
    assert ("a", "b", 10, 10) in got
    assert ("d", "e", 5, 5) in got
    assert not any({p[0], p[1]} == {"b", "c"} for p in got)


def test_count_once_no_duplicates_many_shared_bins(spark):
    # two long intervals sharing MANY bins must appear exactly once
    rows = [("a", 0, 1000), ("b", 3, 997)]
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    out = interval_overlap_join(df, "id", "s", "e", bin_width=8).collect()
    assert len(out) == 1
    assert (out[0].overlap_start, out[0].overlap_end) == (3, 997)


def test_bin_width_invariance_random(spark):
    rnd = random.Random(7)
    rows = []
    for i in range(80):
        s = rnd.randint(-100, 100)
        rows.append((f"i{i:02d}", s, s + rnd.randint(0, 40)))
    df = spark.createDataFrame(rows, ["id", "s", "e"])
    want = _brute(rows)
    for w in (1, 3, 16, 1000):
        assert _got(interval_overlap_join(df, "id", "s", "e", bin_width=w)) == want, w


def test_groups_do_not_bleed_and_invalid_dropped(spark):
    rows = [
        ("g1", "a", 0, 10),
        ("g2", "b", 5, 15),    # overlaps a in time but different group
        ("g1", "c", 8, 12),
        ("g1", "x", 9, 3),     # inverted — dropped
        ("g1", "y", None, 9),  # null — dropped
    ]
    df = spark.createDataFrame(rows, "g string, id string, s bigint, e bigint")
    got = {
        (r.g, r.id_a, r.id_b)
        for r in interval_overlap_join(
            df, "id", "s", "e", group_cols=["g"], bin_width=4
        ).collect()
    }
    assert got == {("g1", "a", "c")}
