import pytest

from cdk_datalake_ingest_spark.dsl.parser import (
    FuncCall,
    Raw,
    TransformParseError,
    parse_transformation,
    split_top_level,
)


def test_plain_column_is_raw():
    assert parse_transformation("some_col") == Raw("some_col")


def test_plain_sql_expr_is_raw():
    node = parse_transformation("round(a * (1 - b), 2)")
    assert isinstance(node, Raw)  # not an fn_transform_ call


def test_simple_call():
    node = parse_transformation("fn_transform_ClearString(STATE)")
    assert node == FuncCall("fn_transform_ClearString", [Raw("STATE")])


def test_nested_call_with_rules():
    node = parse_transformation(
        "fn_transform_Case_with_default(fn_transform_ClearString(STATE),A|B->X,C->Y,$default)"
    )
    assert isinstance(node, FuncCall)
    assert node.name == "fn_transform_Case_with_default"
    assert node.args[0] == FuncCall("fn_transform_ClearString", [Raw("STATE")])
    assert node.args[1] == Raw("A|B->X")
    assert node.args[3] == Raw("$default")


def test_empty_args():
    node = parse_transformation("fn_transform_Datetime()")
    assert node == FuncCall("fn_transform_Datetime", [Raw("")])


def test_unbalanced_raises():
    with pytest.raises(TransformParseError):
        parse_transformation("fn_transform_ClearString(STATE")


def test_split_top_level_respects_nesting():
    assert split_top_level("a,f(b,c),d") == ["a", "f(b,c)", "d"]
    assert split_top_level("") == [""]
