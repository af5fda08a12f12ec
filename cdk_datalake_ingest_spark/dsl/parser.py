"""Recursive-descent parser for `fn_transform_*` DSL strings.

Grammar (informal)::

    expr      := func_call | raw
    func_call := FN_NAME '(' args ')'      # FN_NAME starts with fn_transform_
    args      := expr (',' expr)*          # commas split at top level only

Anything that is not a recognized function call is preserved verbatim
as :class:`Raw` — a column name, a literal (``$``-prefixed by DSL
convention), or a plain Spark SQL expression (the escape hatch the
reference routes through ``F.expr``, transform_light.py:348-349).

The reference's splitters (aje-stage-dms-load.py:102-137 — a stack scan
emitting (function, args) innermost-first, re-applied via synthetic
``$sub_column`` columns) are behaviorally equivalent to this AST for
well-formed inputs; malformed (unbalanced-paren) inputs raise, matching
the reference's explicit balance check (aje-stage-dms-load.py:443-447).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class TransformParseError(ValueError):
    """Raised for unbalanced parentheses / malformed DSL strings."""


@dataclass(frozen=True)
class Raw:
    """Verbatim text argument: column ref, `$literal`, or SQL expression."""

    text: str


@dataclass(frozen=True)
class FuncCall:
    name: str
    args: list = field(default_factory=list)  # list[Raw | FuncCall]


FN_PREFIX = "fn_transform_"


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren-nesting depth 0.

    Same contract as the reference's ``split_parameters``
    (aje-stage-dms-load.py:101-115): an empty string yields [''], and
    separators inside nested calls are preserved.
    """
    parts: list[str] = []
    depth = 0
    last = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise TransformParseError(f"unbalanced ')' in {s!r}")
        elif ch == sep and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    if depth != 0:
        raise TransformParseError(f"unbalanced '(' in {s!r}")
    parts.append(s[last:])
    return parts


def parse_transformation(text: str):
    """Parse a DSL string into ``Raw | FuncCall``."""
    if text.count("(") != text.count(")"):
        # Mirrors the reference's pre-check which raises
        # "query transformation error with column ..." (SJ:443-447).
        raise TransformParseError(f"unbalanced parentheses in {text!r}")
    return _parse_expr(text)


def _parse_expr(text: str):
    stripped = text.strip()
    open_idx = stripped.find("(")
    if (
        open_idx > 0
        and stripped.endswith(")")
        and stripped[:open_idx].strip().startswith(FN_PREFIX)
    ):
        name = stripped[:open_idx].strip()
        inner = stripped[open_idx + 1 : -1]
        args = [_parse_arg(a) for a in split_top_level(inner)]
        return FuncCall(name=name, args=args)
    return Raw(text=text)


def _parse_arg(text: str):
    stripped = text.strip()
    if stripped.startswith(FN_PREFIX) and "(" in stripped:
        return _parse_expr(stripped)
    # args keep original (unstripped) text: each fn decides whether to
    # strip, matching reference behavior (some strip, some do not).
    return Raw(text=text)
