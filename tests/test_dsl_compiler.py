"""Unit tests for every DSL function (D1-D14) including the
bug-compatible quirks and the magic-number boundary cases from
SURVEY.md §5."""

import datetime as dt

import pytest
from pyspark.sql import Row

from cdk_datalake_ingest_spark.dsl import (
    BIGMAGIC,
    SALESFORCE,
    UnknownTransformError,
    compile_transformation,
)


def apply_one(
    spark, rows, text, data_type="string", dialect=BIGMAGIC, strict=True, schema=None
):
    df = spark.createDataFrame(rows, schema) if schema else spark.createDataFrame(rows)
    expr = compile_transformation(text, data_type, dialect, strict)
    return [r["out"] for r in df.withColumn("out", expr).select("out").collect()]


def test_concatenate_default_separator(spark):
    rows = [Row(a="x", b="y")]
    assert apply_one(spark, rows, "fn_transform_Concatenate(a,b)") == ["x|y"]
    assert apply_one(
        spark, rows, "fn_transform_Concatenate(a,b)", dialect=SALESFORCE
    ) == ["x-y"]


def test_concatenate_ws_last_arg_is_sep(spark):
    rows = [Row(a="x", b="y")]
    assert apply_one(spark, rows, "fn_transform_Concatenate_ws(a,b,#)") == ["x#y"]


def test_byte_magic_literal_and_column_default(spark):
    rows = [Row(f="T"), Row(f="F"), Row(f="Z"), Row(f=None)]
    assert apply_one(
        spark, [Row(f=r.f, alt="A") for r in rows], "fn_transform_ByteMagic(f,$U)"
    ) == ["T", "F", "U", "U"]
    assert apply_one(
        spark, [Row(f=r.f, alt="A") for r in rows], "fn_transform_ByteMagic(f,alt)"
    ) == ["T", "F", "A", "A"]


def test_byte_magic_salesforce_byte_strings(spark):
    rows = [Row(f="b'T'"), Row(f="b'F'")]
    assert apply_one(
        spark, rows, "fn_transform_ByteMagic(f,$U)", dialect=SALESFORCE
    ) == ["T", "F"]
    # bigmagic dialect does NOT match byte-strings
    assert apply_one(spark, rows, "fn_transform_ByteMagic(f,$U)") == ["U", "U"]


def test_case_last_rule_wins_bug(spark):
    # D4 bug-compat: each rule overwrites the whole column; only the
    # last rule survives and there is no otherwise -> NULL.
    rows = [Row(s="A"), Row(s="B"), Row(s="C"), Row(s="D")]
    out = apply_one(spark, rows, "fn_transform_Case(s,A|B->first,C->last)")
    assert out == [None, None, "last", None]


def test_case_with_default_simple_sequential(spark):
    rows = [Row(s="A"), Row(s="B"), Row(s="Z")]
    out = apply_one(
        spark, rows, "fn_transform_Case_with_default(s,A->one,A|B->two,$dflt)"
    )
    # sequential overwrite: A matches rule1 then rule2 -> 'two'
    assert out == ["two", "two", "dflt"]


def test_case_with_default_compound_accumulates(spark):
    # D5 compound-key bug-compat: condition accumulates across rules,
    # so any matching row gets the LAST rule's label.
    rows = [
        Row(a="R", b="F"),
        Row(a="N", b="O"),
        Row(a="X", b="Y"),
    ]
    out = apply_one(
        spark,
        rows,
        "fn_transform_Case_with_default(a&b,R&F->refund,N&O->pending,$other)",
    )
    assert out == ["pending", "pending", "other"]


def test_case_with_default_compound_or_values(spark):
    rows = [Row(a="R", b="F"), Row(a="A", b="B"), Row(a="Q", b="Q")]
    out = apply_one(
        spark,
        rows,
        "fn_transform_Case_with_default(a&b,R&F|A&B->hit,$miss)",
    )
    assert out == ["hit", "hit", "miss"]


def test_clear_string(spark):
    rows = [Row(s="  pad  "), Row(s=None)]
    assert apply_one(spark, rows, "fn_transform_ClearString(s)") == ["pad", None]
    assert apply_one(spark, rows, "fn_transform_ClearString(s,$D)") == ["pad", "D"]


def test_clear_double_is_concat_ws_bug(spark):
    # D7 "pending review" bug-compat.
    rows = [Row(a="1", b="2")]
    assert apply_one(spark, rows, "fn_transform_ClearDouble(a,b,.)") == ["1.2"]


def test_clear_double_strict_dialect_numeric_clean(spark):
    """Dialect(strict_clear_double=True) opts out of the reference's
    bug-compatible Concatenate_ws alias: one column, scrubbed to
    sign/digits/decimal point, cast to double, NULL when nothing
    parseable survives."""
    import dataclasses

    from cdk_datalake_ingest_spark.dsl import TransformError

    strict_d = dataclasses.replace(BIGMAGIC, strict_clear_double=True)
    rows = [
        Row(a="$1,234.50"),
        Row(a="  -7 USD"),
        Row(a="n/a"),
        Row(a="1.2.3"),  # two dots -> unparseable -> NULL
        Row(a="1.2e3"),  # exponent form -> NULL, not 1.23
        Row(a="12 apples 34"),  # two digit runs -> NULL, not 1234
        Row(a="3,14"),  # European decimal comma -> NULL, not 314
        Row(a=".5"),  # detached decimal point -> NULL, not 5.0
        Row(a="$.50"),  # ditto -> NULL, not 50.0
        Row(a="+5"),  # explicit plus sign adjacent to digits parses
        Row(a=None),
    ]
    got = apply_one(
        spark,
        rows,
        "fn_transform_ClearDouble(a)",
        data_type="double",
        dialect=strict_d,
    )
    assert got == [
        1234.50, -7.0, None, None, None, None, None, None, None, 5.0, None,
    ]
    # the multi-arg concat form is rejected under the strict dialect
    with pytest.raises(TransformError, match="exactly one column"):
        apply_one(
            spark,
            rows,
            "fn_transform_ClearDouble(a,b,.)",
            dialect=strict_d,
        )


def test_date_to_string(spark):
    rows = [Row(d=dt.date(2024, 3, 5))]
    assert apply_one(spark, rows, "fn_transform_Date_to_String(d,yyyyMM)") == [
        "202403"
    ]


@pytest.mark.parametrize(
    "num,expected",
    [
        ("700000", dt.date(1900, 1, 1) + dt.timedelta(days=700000 - 693596)),
        ("693596", dt.date(1900, 1, 1)),  # offset itself: invalid regex -> default
        ("123", dt.date(1900, 1, 1)),  # invalid -> default
        ("3599999", dt.date(1900, 1, 1) + dt.timedelta(days=3599999 - 693596)),
        ("3600000", dt.date(1900, 1, 1)),  # above window -> default
        (None, dt.date(1900, 1, 1)),
    ],
)
def test_date_magic_boundaries(spark, num, expected):
    rows = [Row(n=num)]
    out = apply_one(
        spark,
        rows,
        "fn_transform_DateMagic(n,yyyy-MM-dd,1900-01-01)",
        "date",
        schema="n string",
    )
    assert out == [expected]


def test_datetime_magic_valid_and_invalid_time(spark):
    base = dt.date(1900, 1, 1)
    day = 738886
    decoded = base + dt.timedelta(days=day - 693596)
    rows = [
        Row(d=str(day), t="134501"),
        Row(d=str(day), t="996100"),  # invalid HHMMSS
        Row(d="123", t="134501"),  # invalid day -> default
    ]
    out = apply_one(
        spark,
        rows,
        "fn_transform_DatetimeMagic(d,t,yyyy-MM-dd HH:mm:ss,1900-01-01)",
        "timestamp_ntz",
    )
    assert out[0] == dt.datetime.combine(decoded, dt.time(13, 45, 1))
    # invalid time: LEGACY prefix-parse keeps the full decoded date
    assert out[1] == dt.datetime.combine(decoded, dt.time(0, 0, 0))
    assert out[2] == dt.datetime(1900, 1, 1)


def test_period_magic(spark):
    rows = [Row(p="2026", e="7"), Row(p=None, e="7")]
    assert apply_one(spark, rows, "fn_transform_PeriodMagic(p,e)") == [
        "202607",
        "190001",
    ]


def test_nested_composition(spark):
    rows = [Row(STATE="  A ", alt="z")]
    out = apply_one(
        spark,
        rows,
        "fn_transform_Case_with_default(fn_transform_ClearString(STATE),A|B->X,C->Y,$d)",
    )
    assert out == ["X"]


def test_datetime_now_and_column(spark):
    rows = [Row(s="2024-03-05 10:00:00")]
    out = apply_one(
        spark, rows, "fn_transform_Datetime(s)", "timestamp_ntz"
    )
    assert out == [dt.datetime(2024, 3, 5, 10, 0, 0)]
    now_out = apply_one(spark, rows, "fn_transform_Datetime()", "timestamp")
    assert now_out[0] is not None


def test_unknown_function_strict_vs_lenient(spark):
    rows = [Row(x="1")]
    with pytest.raises(UnknownTransformError):
        apply_one(spark, rows, "fn_transform_Bogus(x)")
    assert apply_one(spark, rows, "fn_transform_Bogus(x)", strict=False) == [None]


def test_plain_expression_fallback(spark):
    rows = [Row(a="2", b="3")]
    assert apply_one(spark, rows, "a * b + 1", "int") == [7]
