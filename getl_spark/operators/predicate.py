"""Predicate DSL → Spark SQL string compiler.

The one real "parser" in the engine (reference
``getl/blocks/transform/transform.py:265-378``). A predicate is either

* a leaf ``[column, operator, value]``, or
* a logical node ``[predicate, "and"|"or", predicate]`` (recursive).

Compilation emits a SQL boolean expression handed to ``df.where`` —
Catalyst takes over from there, so every predicate written in this DSL
is eligible for parquet/Delta pushdown and partition pruning for free.

Semantics replicated from the reference (quirks included, documented):

* the string value ``'null'`` means SQL NULL: ``== → IS NULL``; any
  other operator → ``IS NOT NULL`` (reference ``transform.py:288-297``);
* string values are single-quoted; ints/floats/bools are emitted bare
  (``True`` parses as the SQL boolean, keywords are case-insensitive);
* list values (for ``in``) render as a parenthesized tuple; a
  single-element list is always rendered quoted
  (reference ``transform.py:370-378``);
* dotted column paths get each hyphen-containing segment backtick
  escaped: ``family.father-status`` → ``family.`father-status```
  (reference ``transform.py:282-285``).

Unlike the reference — which only recognizes a logical node when given
Python *tuples*, making nested predicates unreachable from plain YAML
(``transform.py:312-314``) — both lists and tuples are accepted here,
so nested and/or works directly in YAML documents.
"""

from __future__ import annotations

from typing import Any, Sequence

_SEQ = (list, tuple)
_LEAF_VALUE_TYPES = (str, int, float, bool, list, tuple)


def is_logical(predicate: Sequence) -> bool:
    return (
        len(predicate) == 3
        and isinstance(predicate[0], _SEQ)
        and isinstance(predicate[1], str)
        and isinstance(predicate[2], _SEQ)
        and predicate[1].lower() in ("and", "or")
    )


def _validate_leaf(predicate: Sequence) -> None:
    ok = (
        len(predicate) == 3
        and isinstance(predicate[0], str)
        and isinstance(predicate[1], str)
        and isinstance(predicate[2], _LEAF_VALUE_TYPES)
    )
    if not ok:
        raise ValueError(
            "Predicate must be [column, operator, value] or "
            f"[predicate, and/or, predicate]; got {predicate!r}"
        )


def _escape_column(column: str) -> str:
    return ".".join(
        f"`{seg}`" if "-" in seg else seg for seg in column.split(".")
    )


def _scalar_sql(value: Any) -> str:
    if isinstance(value, bool):
        return str(value)  # TRUE/FALSE keywords are case-insensitive
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    return str(value)


def _format_value(operator: str, value: Any) -> str:
    if isinstance(value, _SEQ):
        # Every element goes through the same quote-escaping as scalar
        # strings — a value like "O'Brien" must not produce malformed
        # SQL (or an injection surface). Single-element lists are still
        # always rendered quoted, as the reference does.
        if len(value) == 1:
            # reference quirk (documented): a single-element in-list is
            # always rendered quoted, even for non-string elements
            return "(" + _scalar_sql(str(value[0])) + ")"
        return "(" + ", ".join(_scalar_sql(v) for v in value) + ")"
    return _scalar_sql(value)


def _compile_leaf(predicate: Sequence) -> str:
    _validate_leaf(predicate)
    column, operator, value = predicate
    col_sql = _escape_column(column)
    if isinstance(value, str) and value == "null":
        null_op = "is null" if operator == "==" else "is not null"
        return f"{col_sql} {null_op}"
    return f"{col_sql} {operator} {_format_value(operator, value)}"


def predicate_to_sql(predicate: Sequence) -> str:
    """Compile a (possibly nested) predicate to a SQL string."""
    if is_logical(predicate):
        left = predicate_to_sql(predicate[0])
        right = predicate_to_sql(predicate[2])
        return f"({left} {predicate[1]} {right})"
    return _compile_leaf(predicate)
