"""Registry contract: every query has an oracle twin, and the computed
stale-first gate rotation keeps never-driver-green (new) entries inside
the first 50 (the driver's observed evaluation window) while demoting
the most recently driver-green ones to the tail."""

from __future__ import annotations


def test_every_query_has_oracle_and_rotation_is_stale_first():
    import __spark_entry__ as e
    from zparse_spark.queries import _last_green_rounds

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(qs) == set(oracles)
    names = list(qs)
    assert list(oracles) == names  # same rotated order on both surfaces

    last = _last_green_rounds()
    ranks = [last.get(n, -1) for n in names]
    # rotation is sorted by most-recent-green round, never-green first
    assert ranks == sorted(ranks)
    # never-driver-green queries (new registrations) fill the 50-entry
    # driver window first; when a round registers MORE than 50 new
    # queries the window must consist entirely of never-green entries
    # (the remainder accumulates a driver row next round — mechanism
    # documented above _last_green_rounds)
    never = [n for n in names if n not in last]
    if len(never) <= 50:
        assert set(never) <= set(names[:50]), never
    else:
        assert all(n not in last for n in names[:50]), names[:50]
    # the artifacts parsed at all (the rotation isn't silently empty)
    assert len(last) >= 50


def test_last_green_rounds_reads_gate_artifacts():
    from zparse_spark.queries import _last_green_rounds

    last = _last_green_rounds()
    # spot-checks against the committed artifacts: tpch_q1 green in
    # every round so far; dedup_clusters_chain first green in r4
    assert last["tpch_q1"] >= 4
    assert last["dedup_clusters_chain"] >= 4
