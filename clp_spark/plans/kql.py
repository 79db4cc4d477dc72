"""KQL query compiler -> pyspark Column expression trees.

Reference: clp_s KQL search (grammar clp_s/search/kql/Kql.g4:1-100; visitor
clp_s/search/kql/kql.cpp:150-260; filter ops
clp_s/search/ast/FilterOperation.hpp:8-17; AST passes clp_s/clp-s.cpp:123-195).
The reference's pass pipeline (De Morgan/DNF, constant prop) collapses into
Catalyst (BooleanSimplification, ConstantFolding — SURVEY.md §4.1); the
passes with SEMANTIC content are reimplemented here:

  * NarrowTypes (NarrowTypes.cpp): a literal interpretation a column's type
    cannot take drops that branch (range op with a non-numeric literal, a
    range op on a string column, a quoted string against a numeric column
    -> constant False), instead of Catalyst's cast-and-coerce.
  * AddTimestampConditions (clp-s.cpp:123-147): CLI begin/end timestamps
    become filters on the authoritative timestamp column; no such column +
    bounds requested is an error.
  * ConvertToExists: `field: *` -> isNotNull (EXISTS), NOT thereof NEXISTS.

Grammar parity with the reference lexer/visitor:
  * NOT inversion produces NEQ filters (FilterOperation::NEQ) — parse_kql
    folds `NOT f: v` to op '!=' like Expression::invert().
  * escaped keys: `a\\.b.c` is the two-segment key ("a.b", "c"); `\\:`
    `\\<` `\\*` etc. are literal characters (test-kql.cpp:216-310).
  * namespaces: a leading unescaped @ $ ! # on a column is its namespace
    (test-kql.cpp:282-330); resolution matches fields literally named
    `<ns><name>` (this engine stores namespaced keys verbatim).
  * nested queries: `a: {b: 0 OR c: 1}` prefixes the sub-filters
    (visitNestedQuery -> prepend_column).
  * value lists: `col: (AND v1 v2)` / `(OR ...)` / `(NOT ...)`; bare list
    defaults to OR (visitList_of_values).
  * bare value: `foo` searches every column (`*` descriptor,
    visitValue_expression).
  * date literals: `col >= date("2024-01-02 03:04:05")`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.wildcard import wildcard_to_regex

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrace>\{) | (?P<rbrace>\}) |
        (?P<op>>=|<=|>|<|:) |
        (?P<date>date\((?:"(?:[^"\\]|\\.)*"|[^)"]+)\)) |
        (?P<quoted>"(?:[^"\\]|\\.)*") |
        (?P<word>(?:\\.|[^\s():<>"{}])+)
    )""",
    re.X,
)

_NAMESPACE_CHARS = "@$!#"


class KqlError(ValueError):
    pass


@dataclass(frozen=True)
class ColDesc:
    """A column descriptor: namespace + descriptor tokens (split on
    unescaped '.'; tokens may contain * / ? wildcards). `regexes` holds the
    per-token match regex (escaped wildcards are literal characters)."""

    namespace: str
    tokens: tuple[str, ...]
    regexes: tuple[str, ...]

    @property
    def is_star(self) -> bool:
        return self.tokens == ("*",)


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
        for kind in ("lparen", "rparen", "lbrace", "rbrace", "op", "date", "quoted", "word"):
            val = m.group(kind)
            if val is not None:
                tokens.append((kind, val))
                break
    return tokens


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


def _parse_column(raw: str, quoted: bool) -> ColDesc:
    """Split an (escaped) column string into namespace + descriptor tokens.

    Reference DescriptorToken::create_descriptor_from_escaped_token: '.'
    separates tokens unless escaped; a leading unescaped namespace char is
    the namespace; escapes make any char literal (incl. wildcards)."""
    ns = ""
    i = 0
    if raw and raw[0] in _NAMESPACE_CHARS:
        ns = raw[0]
        i = 1
    tokens: list[str] = []
    regexes: list[str] = []
    cur: list[str] = []
    cur_rx: list[str] = []
    n = len(raw)
    while i < n:
        c = raw[i]
        if c == "\\" and i + 1 < n:
            nxt = raw[i + 1]
            cur.append(nxt)
            cur_rx.append(re.escape(nxt))
            i += 2
        elif c == "." and not quoted:
            tokens.append("".join(cur))
            regexes.append("".join(cur_rx))
            cur, cur_rx = [], []
            i += 1
        elif c == "*" and not quoted:
            cur.append(c)
            cur_rx.append(".*")
            i += 1
        elif c == "?" and not quoted:
            cur.append(c)
            cur_rx.append(".")
            i += 1
        else:
            cur.append(c)
            cur_rx.append(re.escape(c))
            i += 1
    tokens.append("".join(cur))
    regexes.append("".join(cur_rx))
    return ColDesc(ns, tuple(tokens), tuple(regexes))


def _unescape_value(raw: str) -> str:
    return re.sub(r"\\(.)", r"\1", raw)


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

    # keywords are case-insensitive, like the reference grammar's
    # [Aa][Nn][Dd] lexer rules (clp_s/search/kql/Kql.g4); an unquoted
    # bare "and"/"or"/"not" is therefore always a keyword, never a value
    def or_expr(self):
        left = self.and_expr()
        while self.peek()[0] == "word" and self.peek()[1].upper() == "OR":
            self.next()
            left = ("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.unary()
        while True:
            kind, val = self.peek()
            if kind == "word" and val.upper() == "AND":
                self.next()
                left = ("and", left, self.unary())
            elif kind in ("lparen", "quoted", "date") or (
                kind == "word" and val.upper() not in ("OR", "AND")
            ):
                # implicit AND (KQL juxtaposition)
                left = ("and", left, self.unary())
            else:
                return left

    def unary(self):
        kind, val = self.peek()
        if kind == "word" and val.upper() == "NOT":
            self.next()
            return _invert(self.unary())
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
            field_raw, quoted = _unquote(val), True
        elif kind == "word":
            field_raw, quoted = val, False
        elif kind == "date":
            # bare date literal searched across all columns
            return ("filter", ColDesc("", ("*",), (".*",)), ":", ("date", _date_inner(val)), False)
        else:
            raise KqlError(f"expected field, got {val!r}")

        opk, opv = self.peek()
        if opk != "op":
            # bare value -> search all columns (visitValue_expression)
            if field_raw == "*" and not quoted:
                return ("all",)
            return (
                "filter",
                ColDesc("", ("*",), (".*",)),
                ":",
                _unescape_value(field_raw) if not quoted else field_raw,
                quoted,
            )
        self.next()
        col = _parse_column(field_raw, quoted)

        vk, vv = self.peek()
        if vk == "lbrace":
            if opv != ":":
                raise KqlError("nested query requires ':'")
            self.next()
            sub = self.or_expr()
            if self.next()[0] != "rbrace":
                raise KqlError("expected }")
            return _prepend_column(sub, col)
        if vk == "lparen" and opv == ":":
            return self._list_of_values(col)
        vk, vv = self.next()
        if vk == "quoted":
            value, vquoted = _unquote(vv), True
        elif vk == "word":
            value, vquoted = _unescape_value(vv), False
        elif vk == "date":
            value, vquoted = ("date", _date_inner(vv)), False
        else:
            raise KqlError(f"expected value for column {col.tokens!r}")
        return ("filter", col, opv, value, vquoted)

    def _list_of_values(self, col: ColDesc):
        self.next()  # (
        cond = "or"
        invert_each = False
        kind, val = self.peek()
        if kind == "word" and val in ("AND", "OR", "NOT"):
            self.next()
            if val == "AND":
                cond = "and"
            elif val == "NOT":
                cond = "and"
                invert_each = True
        filters = []
        while True:
            kind, val = self.peek()
            if kind == "rparen":
                self.next()
                break
            if kind == "quoted":
                self.next()
                f = ("filter", col, ":", _unquote(val), True)
            elif kind == "word":
                self.next()
                f = ("filter", col, ":", _unescape_value(val), False)
            elif kind == "date":
                self.next()
                f = ("filter", col, ":", ("date", _date_inner(val)), False)
            else:
                raise KqlError("expected value in list")
            filters.append(_invert(f) if invert_each else f)
        if not filters:
            raise KqlError("empty value list")
        out = filters[0]
        for f in filters[1:]:
            out = (cond, out, f)
        return out


def _date_inner(tok: str) -> str:
    inner = tok[len("date("):-1]
    if inner.startswith('"') and inner.endswith('"'):
        inner = _unquote(inner)
    return inner


_INVERSE_OP = {":": "!=", "!=": ":", ">": "<=", "<=": ">", "<": ">=", ">=": "<"}


def _invert(node):
    """Expression::invert() analog: NOT over a filter flips its operation
    (EQ->NEQ, LT->GTE, ...; EXISTS->NEXISTS is represented as !=*)."""
    tag = node[0]
    if tag == "filter":
        _, col, op, value, quoted = node
        return ("filter", col, _INVERSE_OP[op], value, quoted)
    if tag == "and":
        return ("or", _invert(node[1]), _invert(node[2]))
    if tag == "or":
        return ("and", _invert(node[1]), _invert(node[2]))
    if tag == "all":
        return ("none",)
    if tag == "none":
        return ("all",)
    raise KqlError(f"cannot invert {node!r}")


def _prepend_column(node, col: ColDesc):
    """visitNestedQuery: prefix every filter's descriptor with `col`."""
    tag = node[0]
    if tag == "filter":
        _, sub, op, value, quoted = node
        merged = ColDesc(
            col.namespace, col.tokens + sub.tokens, col.regexes + sub.regexes
        )
        return ("filter", merged, op, value, quoted)
    if tag in ("and", "or"):
        return (tag, _prepend_column(node[1], col), _prepend_column(node[2], col))
    if tag in ("all", "none"):
        return node
    raise KqlError(f"cannot prepend column to {node!r}")


_NUM_RE = re.compile(r"-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?\Z")

_NUMERIC_DTS = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")
_TS_DTS = ("timestamp", "timestamp_ntz", "date")


def _resolve_paths(df, col: ColDesc) -> list[tuple[str, ...]]:
    """Concrete field paths matching the descriptor tokens (schema walk;
    literal dots in field names are fine — no dotted-string parsing).
    Accepts a DataFrame or a StructType."""
    from pyspark.sql.types import StructType

    first_rx = re.compile(re.escape(col.namespace) + col.regexes[0])
    results: list[tuple[str, ...]] = []
    seen: set[tuple[str, ...]] = set()

    def add(p):
        if p not in seen:
            seen.add(p)
            results.append(p)

    def walk(schema, tok_i: int, path: tuple[str, ...]):
        tok = col.tokens[tok_i]
        last = tok_i == len(col.tokens) - 1
        if tok == "*":
            # a lone '*' token spans ANY number of levels (the reference's
            # match-any-key wildcard descriptor)
            if not last:
                walk(schema, tok_i + 1, path)  # '*' matches zero levels
            for f in schema.fields:
                if not path and col.namespace and not f.name.startswith(col.namespace):
                    continue
                p = path + (f.name,)
                if isinstance(f.dataType, StructType):
                    walk(f.dataType, tok_i, p)
                elif last:
                    add(p)
            return
        rx = first_rx if tok_i == 0 else re.compile(col.regexes[tok_i])
        for f in schema.fields:
            if not rx.fullmatch(f.name):
                continue
            p = path + (f.name,)
            if last:
                if not isinstance(f.dataType, StructType):
                    add(p)
            elif isinstance(f.dataType, StructType):
                walk(f.dataType, tok_i + 1, p)

    from pyspark.sql.types import StructType as _ST

    walk(df if isinstance(df, _ST) else df.schema, 0, ())
    return results


def _path_col(df: DataFrame, path: tuple[str, ...]) -> Column:
    # backticks: a field literally named "a.b" must not parse as nesting
    c = df["`" + path[0].replace("`", "``") + "`"]
    for name in path[1:]:
        c = c.getField(name)
    return c


def _path_dtype(df: DataFrame, path: tuple[str, ...]) -> str:
    from pyspark.sql.types import StructType

    dt = df.schema
    for name in path:
        assert isinstance(dt, StructType)
        dt = dt[name].dataType
    return dt.simpleString()


def _array_filter(col: Column, value: str, quoted: bool) -> Column:
    """Array-column match (reference evaluate_array_filter,
    clp_s/search/QueryRunner.hpp:282): any element matches the literal or
    wildcard — a higher-order `exists`, no explode/shuffle."""
    if not quoted and ("*" in value or "?" in value):
        rx = wildcard_to_regex(value)
        return F.exists(col, lambda x: x.cast("string").rlike(rx))
    return F.array_contains(col.cast("array<string>"), value)


_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


def _num_lit(value: str) -> Column:
    """Numeric query literal -> Spark literal. Integer literals that cannot
    fit int64 fall back to a double literal (the reference's NarrowTypes
    drops a failed int conversion to float, clp_s/search/NarrowTypes.cpp);
    a bare F.lit(big python int) would raise NumberFormatException in py4j,
    and CPython refuses int() past 4300 digits outright."""
    if "." in value or "e" in value.lower():
        return F.lit(float(value))
    try:
        v = int(value)
    except ValueError:  # absurd digit count: CPython conversion limit
        return F.lit(float(value))
    if v < _INT64_MIN or v > _INT64_MAX:
        return F.lit(float(v))
    return F.lit(v)


def _parse_date_ms(s: str) -> int:
    from ..functions.timestamps import search_timestamp_batch
    import pandas as pd

    res = search_timestamp_batch(pd.Series([s]))
    if int(res["pattern_id"].iloc[0]) < 0:
        raise KqlError(f"cannot parse date literal {s!r}")
    return int(res["ts_ms"].iloc[0])


def _one_path_filter(df, path, op, value, quoted) -> Column:
    col = _path_col(df, path)
    dt = _path_dtype(df, path)
    is_date_lit = isinstance(value, tuple) and value[0] == "date"
    # a timestamp-typed column gives any date-parsable string literal its
    # EpochDate interpretation (reference StringLiteral::as_epoch_date)
    if not is_date_lit and dt in _TS_DTS and isinstance(value, str) and not (
        "*" in value or "?" in value
    ):
        value, is_date_lit = ("date", value), True
    if is_date_lit:
        if dt not in _TS_DTS and dt not in _NUMERIC_DTS:
            return F.lit(False)  # NarrowTypes: no date interpretation
        try:
            ts_ms = _parse_date_ms(value[1])
        except KqlError:
            return F.lit(False)
        lhs = (
            F.unix_millis(col.cast("timestamp")) if dt in _TS_DTS else col.cast("bigint")
        )
        lit = F.lit(ts_ms)
        return {
            ":": lhs == lit, "!=": lhs != lit,
            ">": lhs > lit, ">=": lhs >= lit, "<": lhs < lit, "<=": lhs <= lit,
        }[op]

    if op in (":", "!="):
        neg = op == "!="
        if dt.startswith("array"):
            if value == "*" and not quoted:
                base = col.isNotNull()
            else:
                base = _array_filter(col, value, quoted)
            return ~base if neg else base
        if value == "*" and not quoted:
            # EXISTS / NEXISTS (ConvertToExists.hpp)
            return col.isNull() if neg else col.isNotNull()
        if not quoted and ("*" in value or "?" in value):
            base = col.cast("string").rlike(wildcard_to_regex(value))
            return ~base if neg else base
        if _NUM_RE.match(value):
            if dt in _NUMERIC_DTS or dt.startswith("decimal"):
                lit = _num_lit(value)
                if quoted:
                    # NarrowTypes: a QUOTED literal is string-typed only; a
                    # numeric column has no string interpretation -> False for
                    # EQ. For NEQ keep the NEQ-requires-existence semantics
                    # (col != lit excludes nulls), so null/absent stays out.
                    return col.isNotNull() if neg else F.lit(False)
                return (col != lit) if neg else (col == lit)
        base = col.cast("string") == F.lit(value)
        return ~base if neg else base

    if op in (">", ">=", "<", "<="):
        # NarrowTypes: range ops exist only for numeric (or date) literals
        # and numeric columns; anything else is branch-dropped to False
        # (NarrowTypes.cpp: as_clp_string/as_var_string fail for ranges).
        if quoted or not _NUM_RE.match(value):
            return F.lit(False)
        if not (dt in _NUMERIC_DTS or dt.startswith("decimal")):
            return F.lit(False)
        lit = _num_lit(value)
        return {">": col > lit, ">=": col >= lit, "<": col < lit, "<=": col <= lit}[op]
    raise KqlError(f"unsupported op {op!r}")


def _filter_to_column(df: DataFrame, col: ColDesc, op: str, value, quoted: bool) -> Column:
    paths = _resolve_paths(df, col)
    if not paths:
        if col.is_star or any("*" in t or "?" in t for t in col.tokens):
            return F.lit(False)  # wildcard key matching nothing
        raise KqlError(f"unresolvable column {'.'.join(col.tokens)!r}")
    out = _one_path_filter(df, paths[0], op, value, quoted)
    for p in paths[1:]:
        out = out | _one_path_filter(df, p, op, value, quoted)
    return out


def _to_column(df: DataFrame, node) -> Column:
    tag = node[0]
    if tag == "all":
        return F.lit(True)
    if tag == "none":
        return F.lit(False)
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


def authoritative_ts_col(df: DataFrame) -> str | None:
    """The archive's authoritative timestamp column (reference
    TimestampDictionary::get_authoritative_timestamp_tokenized_column):
    first timestamp-typed column, else a column with a timestamp-ish name."""
    for f in df.schema.fields:
        if f.dataType.simpleString() in _TS_DTS:
            return f.name
    names = {"ts", "timestamp", "@timestamp", "datetime", "date"}
    for f in df.schema.fields:
        if f.name.lower() in names:
            return f.name
    return None


def kql_filter(
    df: DataFrame,
    query: str,
    *,
    begin_ts_ms: int | None = None,
    end_ts_ms: int | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Apply a KQL query as a Catalyst-optimizable filter.

    begin/end_ts_ms add implicit conditions on the authoritative timestamp
    column (reference AddTimestampConditions, clp-s.cpp:123-147); asking for
    a time range when the table has no timestamp column is an error, like
    the reference's EmptyExpr fast-fail."""
    cond = _to_column(df, parse_kql(query))
    if begin_ts_ms is not None or end_ts_ms is not None:
        tcol = ts_col or authoritative_ts_col(df)
        if tcol is None:
            raise KqlError(
                "timestamp filters requested but no authoritative timestamp "
                "column exists in this table"
            )
        ms = F.unix_millis(F.col(tcol).cast("timestamp"))
        if begin_ts_ms is not None:
            cond = cond & (ms >= F.lit(begin_ts_ms))
        if end_ts_ms is not None:
            cond = cond & (ms <= F.lit(end_ts_ms))
    return df.filter(cond)


def parse_sql_expression(text: str):
    """SQL search grammar — reference-parity stub.

    The reference's SQL grammar is deliberately a work-in-progress stub
    (clp_s/search/sql/Sql.g4: `start: EOF`): empty input parses to
    EmptyExpr, anything else is a parse error (sql.cpp returns nullptr;
    test-sql.cpp asserts exactly this). Mirrored here: '' -> the ("none",)
    AST (matches nothing, like EmptyExpr), non-empty -> None. KQL
    (parse_kql) is the full-featured search grammar, as upstream."""
    if text.strip() == "":
        return ("none",)
    return None
