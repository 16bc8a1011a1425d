from __future__ import annotations

from zparse_spark.functions.json_profile import json_schema_profile


def _profile(spark, docs):
    df = spark.createDataFrame([(d,) for d in docs], "props string")
    out = json_schema_profile(df, "props").collect()
    return {(r.path, r.vtype): (r.n, r.row_share) for r in out}


def test_nested_paths_and_types(spark):
    grid = _profile(
        spark,
        [
            '{"a": 1, "b": {"c": "x", "d": [1, 2.5, "s"]}}',
            '{"a": true, "b": {"c": null}}',
        ],
    )
    assert grid[("$", "object")] == (2, 1.0)
    assert grid[("$.a", "int")][0] == 1
    assert grid[("$.a", "bool")][0] == 1  # bool is NOT int
    assert grid[("$.b", "object")][0] == 2
    assert grid[("$.b.c", "string")][0] == 1
    assert grid[("$.b.c", "null")][0] == 1
    assert grid[("$.b.d", "array")][0] == 1
    # array elements collapse onto one [] wildcard path
    assert grid[("$.b.d[]", "int")][0] == 1
    assert grid[("$.b.d[]", "double")][0] == 1
    assert grid[("$.b.d[]", "string")][0] == 1


def test_malformed_and_missing_are_profiled(spark):
    grid = _profile(spark, ['{"a": 1}', "{broken", None, None])
    assert grid[("$", "malformed")] == (1, 0.25)
    assert grid[("$", "missing")] == (2, 0.5)
    assert grid[("$", "object")] == (1, 0.25)


def test_non_object_roots(spark):
    grid = _profile(spark, ["[1, 2]", '"just a string"', "42", "null"])
    assert grid[("$", "array")][0] == 1
    assert grid[("$[]", "int")][0] == 2
    assert grid[("$", "string")][0] == 1
    assert grid[("$", "int")][0] == 1
    assert grid[("$", "null")][0] == 1


def test_row_share_denominator_counts_all_rows(spark):
    # 4 rows total -> every share is n/4 even for nested paths
    grid = _profile(spark, ['{"a": 1}', '{"a": 2}', "{bad", None])
    assert grid[("$.a", "int")] == (2, 0.5)


def test_plan_one_arrow_eval_one_exchange(spark):
    df = spark.createDataFrame([('{"a": 1}',)] * 32, "props string")
    prof = json_schema_profile(df, "props")
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BatchEvalPython" not in plan, plan
    # groupBy shuffle + the tiny single-partition window exchange only
    assert plan.count("Exchange") <= 2, plan
