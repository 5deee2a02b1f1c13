"""local_rows_df (optimization r13): small driver-side row lists become
LocalRelations (SQL VALUES), not 32-python-task pickled RDDs, with values
and types identical to what createDataFrame would have produced."""

from __future__ import annotations

from url_counter_mapreduce_spark.tables import LOCAL_ROWS_MAX, local_rows_df


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def _names_types(df):
    # nullability deliberately excluded: VALUES marks NULL-free columns
    # non-nullable (tighter than createDataFrame's all-nullable), which
    # only gives the optimizer MORE information — values are what matter
    return [(f.name, f.dataType) for f in df.schema.fields]


def test_matches_createdataframe_values_and_schema(spark):
    rows = [
        (1, "plain", True, 1.5, None),
        (-7, "quo'te and back\\slash", False, -0.25, "x"),
        (0, "", True, 0.0, None),
    ]
    schema = "a long, b string, c boolean, d double, e string"
    got = local_rows_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert _names_types(got) == _names_types(want)
    assert _rows_set(got) == _rows_set(want)


def test_is_local_relation_no_scan(spark):
    df = local_rows_df(spark, [(1, "a"), (2, "b")], "k int, v string")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan


def test_name_list_schema_inference(spark):
    rows = [("s1", 3, 10), ("s2", 0, None)]
    got = local_rows_df(spark, rows, ["source", "bucket", "offset"])
    want = spark.createDataFrame(rows, ["source", "bucket", "offset"])
    assert _names_types(got) == _names_types(want)
    assert _rows_set(got) == _rows_set(want)


def test_empty_and_oversize_fall_back(spark):
    empty = local_rows_df(spark, [], "a long")
    assert empty.count() == 0
    big = [(i,) for i in range(LOCAL_ROWS_MAX + 1)]
    df = local_rows_df(spark, big, "a long")
    assert df.count() == LOCAL_ROWS_MAX + 1
