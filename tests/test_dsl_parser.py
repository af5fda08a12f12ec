import pytest

from cdk_datalake_ingest_spark.dsl.parser import (
    FN_PREFIX,
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


# ---------------------------------------------------------------------------
# Property: printing an arbitrary AST back to a fn_transform_* string and
# re-parsing is the identity. Extends the hand-written cases above to the
# whole space of well-formed nestings the grammar admits (commas and parens
# are excluded from Raw leaves because the grammar reserves them; leaves are
# pre-stripped because roundtrip preserves, not normalizes, whitespace).
# ---------------------------------------------------------------------------

def _show(node) -> str:
    if isinstance(node, Raw):
        return node.text
    return f"{node.name}({','.join(_show(a) for a in node.args)})"


def test_parser_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(
        [
            "fn_transform_Concatenate",
            "fn_transform_Case_with_default",
            "fn_transform_Datetime",
            "fn_transform_ByteMagic",
            "fn_transform_Custom_thing",
        ]
    )
    leaves = (
        st.text(
            alphabet="abcz_$0123456789 -:/='%.", min_size=0, max_size=12
        )
        .map(str.strip)
        .filter(lambda s: not s.startswith(FN_PREFIX))
        .map(Raw)
    )
    asts = st.recursive(
        leaves,
        lambda children: st.builds(
            lambda n, a: FuncCall(name=n, args=list(a)),
            names,
            st.lists(children, min_size=1, max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=300, deadline=None)
    @given(ast=asts)
    def run(ast):
        assert parse_transformation(_show(ast)) == ast

    run()
