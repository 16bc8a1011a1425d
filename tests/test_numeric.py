"""round_duck: bit-exact emulation of DuckDB's round(DOUBLE, d).

The r5 driver gate hashed five queries red on last-ulp divergence
between Spark's BigDecimal-based round and DuckDB's scaled-std::round;
these tests pin the emulation against DuckDB itself over adversarial
quotients, exact .5 boundaries and negatives.
"""

import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from zparse_spark.functions.numeric import round_duck


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@pytest.mark.parametrize("digits", [4, 6])
def test_round_duck_matches_duckdb_bitwise(spark, digits):
    xs = [i / j for i in range(1, 120) for j in range(1, 23)]
    xs += [k / 2 / 10**digits for k in range(1, 99, 2)]          # exact .5 ties
    xs += [-x for x in xs[:200]]
    xs += [0.0, -0.0, 1e-12, -1e-12, -1e-9, 0.1234565, 0.12345649999999999]
    con = duckdb.connect()
    duck = [
        r[0]
        for r in con.execute(
            "SELECT round(x, ?) FROM (SELECT unnest(?::DOUBLE[]) AS x)", [digits, xs]
        ).fetchall()
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r["r"]
        for r in df.select(round_duck(F.col("x"), digits).alias("r")).collect()
    ]
    assert len(got) == len(duck)
    mism = [
        (x, g, d)
        for x, g, d in zip(xs, got, duck)
        if _bits(g) != _bits(d)
    ]
    assert not mism, f"{len(mism)} bit mismatches, first: {mism[:3]}"


def test_round_duck_null_passthrough(spark):
    df = spark.createDataFrame([(None,), (1.25,)], "x double")
    out = df.select(round_duck(F.col("x"), 6).alias("r")).collect()
    assert out[0]["r"] is None and out[1]["r"] == 1.25
