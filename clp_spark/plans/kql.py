"""KQL-subset query compiler -> pyspark Column expression trees.

Reference: clp_s KQL search (grammar clp_s/search/kql/Kql.g4:1-40; filter ops
clp_s/search/ast/FilterOperation.hpp:8-17; AST passes clp_s/clp-s.cpp:123-195).
The reference's pass pipeline (De Morgan/DNF, constant prop, type narrowing)
collapses into Catalyst (BooleanSimplification, ConstantFolding — SURVEY.md §4.1),
so this module only parses and builds a Column tree.

Supported subset (the operations the reference's evaluators implement,
QueryRunner.hpp:179-282): field:value (exact or wildcard string), numeric
comparisons > >= < <=, field:* (EXISTS -> isNotNull), NOT / AND / OR,
parentheses, quoted values, bare * (match-all).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.wildcard import wildcard_to_regex

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<op>>=|<=|>|<|:) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s():<>"]+)
    )""",
    re.X,
)

_KEYWORDS = {"AND", "OR", "NOT"}


class KqlError(ValueError):
    pass


def _lex(query: str):
    tokens = []
    pos = 0
    while pos < len(query):
        m = _TOKEN_RE.match(query, pos)
        if not m or m.end() == pos:
            if query[pos:].strip():
                raise KqlError(f"cannot lex at {query[pos:]!r}")
            break
        pos = m.end()
        for kind in ("lparen", "rparen", "op", "quoted", "word"):
            val = m.group(kind)
            if val is not None:
                tokens.append((kind, val))
                break
    return tokens


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        e = self.or_expr()
        if self.i < len(self.toks):
            raise KqlError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == ("word", "OR"):
            self.next()
            left = ("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.unary()
        while True:
            kind, val = self.peek()
            if (kind, val) == ("word", "AND"):
                self.next()
                left = ("and", left, self.unary())
            elif kind in ("lparen", "quoted") or (kind == "word" and val not in {"OR", ")"} and val != "AND"):
                # implicit AND (KQL juxtaposition)
                left = ("and", left, self.unary())
            else:
                return left

    def unary(self):
        kind, val = self.peek()
        if (kind, val) == ("word", "NOT"):
            self.next()
            return ("not", self.unary())
        if kind == "lparen":
            self.next()
            e = self.or_expr()
            if self.next()[0] != "rparen":
                raise KqlError("expected )")
            return e
        return self.filter_expr()

    def filter_expr(self):
        kind, val = self.next()
        if kind == "quoted":
            val = _unquote(val)
        elif kind != "word":
            raise KqlError(f"expected field, got {val!r}")
        if val == "*" and self.peek()[0] != "op":
            return ("all",)
        field = val
        opk, opv = self.next()
        if opk != "op":
            raise KqlError(f"expected operator after {field!r}")
        vk, vv = self.next()
        if vk == "quoted":
            value, quoted = _unquote(vv), True
        elif vk == "word":
            value, quoted = vv, False
        else:
            raise KqlError(f"expected value for {field!r}")
        return ("filter", field, opv, value, quoted)


_NUM_RE = re.compile(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?\Z")


def _flat_dtypes(df: DataFrame) -> list[tuple[str, str]]:
    """(dotted-path, dtype) for every leaf column, nested structs included."""
    from pyspark.sql.types import StructType

    out: list[tuple[str, str]] = []

    def walk(schema, prefix=""):
        for f in schema.fields:
            p = f"{prefix}{f.name}"
            if isinstance(f.dataType, StructType):
                walk(f.dataType, p + ".")
            else:
                out.append((p, f.dataType.simpleString()))

    walk(df.schema)
    return out


def _array_filter(col: Column, value: str, quoted: bool) -> Column:
    """Array-column match (reference evaluate_array_filter,
    clp_s/search/QueryRunner.hpp:282): any element matches the literal or
    wildcard — a higher-order `exists`, no explode/shuffle."""
    if not quoted and ("*" in value or "?" in value):
        rx = wildcard_to_regex(value)
        return F.exists(col, lambda x: x.cast("string").rlike(rx))
    return F.array_contains(col.cast("array<string>"), value)


def _wildcard_fields(df: DataFrame, pattern: str) -> list[str]:
    """Wildcard KEY resolution (reference test-kql wildcard-key cases):
    'err.*' or '*' expand to every matching column path."""
    from ..functions.wildcard import wildcard_to_regex as w2r

    rx = re.compile(w2r(pattern))
    names: list[str] = []

    def walk(schema, prefix=""):
        for f in schema.fields:
            p = f"{prefix}{f.name}"
            if hasattr(f.dataType, "fields"):
                walk(f.dataType, p + ".")
            else:
                names.append(p)

    walk(df.schema)
    return [n for n in names if rx.fullmatch(n)]


def _filter_to_column(df: DataFrame, field: str, op: str, value: str, quoted: bool) -> Column:
    if ("*" in field or "?" in field) and field != "*":
        matches = _wildcard_fields(df, field)
        if not matches:
            return F.lit(False)
        out = _filter_to_column(df, matches[0], op, value, quoted)
        for m in matches[1:]:
            out = out | _filter_to_column(df, m, op, value, quoted)
        return out
    if field == "*":
        out = F.lit(False)
        for m in _wildcard_fields(df, "*"):
            out = out | _filter_to_column(df, m, op, value, quoted)
        return out
    col = df[field]  # raises for unknown field (reference: unresolvable column)
    dt = dict(_flat_dtypes(df)).get(field, "")
    if op == ":" and dt.startswith("array"):
        if value == "*" and not quoted:
            return col.isNotNull()
        return _array_filter(col, value, quoted)
    if op == ":":
        if value == "*" and not quoted:
            return col.isNotNull()  # EXISTS (clp_s/search/ast/ConvertToExists.hpp)
        if not quoted and ("*" in value or "?" in value):
            return col.cast("string").rlike(wildcard_to_regex(value))
        if not quoted and _NUM_RE.match(value):
            # numeric equality on numeric columns, string equality otherwise
            if dt in ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal"):
                return col == F.lit(float(value) if "." in value or "e" in value.lower() else int(value))
        return col.cast("string") == F.lit(value)
    if op in (">", ">=", "<", "<="):
        lit = F.lit(float(value)) if _NUM_RE.match(value) and "." in value else (
            F.lit(int(value)) if _NUM_RE.match(value) else F.lit(value)
        )
        return {">": col > lit, ">=": col >= lit, "<": col < lit, "<=": col <= lit}[op]
    raise KqlError(f"unsupported op {op!r}")


def _to_column(df: DataFrame, node) -> Column:
    tag = node[0]
    if tag == "all":
        return F.lit(True)
    if tag == "and":
        return _to_column(df, node[1]) & _to_column(df, node[2])
    if tag == "or":
        return _to_column(df, node[1]) | _to_column(df, node[2])
    if tag == "not":
        return ~_to_column(df, node[1])
    if tag == "filter":
        return _filter_to_column(df, *node[1:])
    raise KqlError(f"bad node {node!r}")


def parse_kql(query: str):
    """Parse KQL text into an AST (driver-side, tiny)."""
    tokens = _lex(query)
    if not tokens:
        raise KqlError("empty query")
    return _Parser(tokens).parse()


def kql_filter(df: DataFrame, query: str) -> DataFrame:
    """Apply a KQL query as a Catalyst-optimizable filter."""
    return df.filter(_to_column(df, parse_kql(query)))
