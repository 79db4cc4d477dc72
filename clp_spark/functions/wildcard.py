"""CLP wildcard query strings: '*' (any run), '?' (any one char), '\\' escape.

Semantics re-derived from the reference (NOT ported code):
  - matcher: reference components/core/src/clp/string_utils/string_utils.cpp
    (wildcard_match_unsafe / _case_sensitive; case-insensitive = lowercase both)
  - query cleanup (collapse '**', '\\*'->literal, drop dangling escape):
    reference clp/string_utils/string_utils.cpp (clean_up_wildcard_search_string)
  - text search queries are implicit substring matches: query q means *q*
    (reference docs/src/user-docs/reference-text-search-syntax.md:12-14)

These run on the driver (query compilation) and inside JVM `rlike` filters
via :func:`wildcard_to_regex` — the data path never calls per-row Python.
"""

from __future__ import annotations

import re

_REGEX_SPECIALS = set(".^$+{}[]|()?*\\")


def clean_up_wildcard_search_string(wild: str) -> str:
    """Canonicalize a wildcard string: collapse runs of '*' (also absorbing
    '?' adjacent to '*' is NOT done — '?' is precise), keep escapes paired,
    drop a dangling trailing escape."""
    out = []
    i = 0
    n = len(wild)
    while i < n:
        c = wild[i]
        if c == "*":
            out.append("*")
            while i < n and wild[i] == "*":
                i += 1
            continue
        if c == "\\":
            if i + 1 < n:
                out.append(wild[i : i + 2])
                i += 2
            else:
                i += 1  # dangling escape: drop
            continue
        out.append(c)
        i += 1
    return "".join(out)


def wildcard_to_regex(wild: str, *, full_match: bool = True) -> str:
    """Translate a CLP wildcard string to a Java/RE2-safe regex.

    '*' -> '(?s:.*)', '?' -> '(?s:.)', '\\x' -> literal x; all regex
    metacharacters escaped. The '(?s:)' groups make '*'/'?' cross newlines,
    matching the reference's byte-oriented matcher.
    """
    out = []
    i = 0
    n = len(wild)
    while i < n:
        c = wild[i]
        if c == "*":
            out.append("(?s:.*)")
        elif c == "?":
            out.append("(?s:.)")
        elif c == "\\" and i + 1 < n:
            i += 1
            nxt = wild[i]
            out.append("\\" + nxt if nxt in _REGEX_SPECIALS else re.escape(nxt))
        else:
            out.append("\\" + c if c in _REGEX_SPECIALS else re.escape(c))
        i += 1
    body = "".join(out)
    # ^/$ (not \A/\Z) so the regex is valid in both Java (Spark rlike) and
    # RE2 (DuckDB oracle); neither is in multiline mode so they anchor the
    # whole string.
    return ("^" + body + "$") if full_match else body


def wildcard_match(tame: str, wild: str, case_sensitive: bool = True) -> bool:
    """Driver-side wildcard match (used for dictionary pruning; small inputs)."""
    if not case_sensitive:
        tame, wild = tame.lower(), wild.lower()
    return re.fullmatch(wildcard_to_regex(clean_up_wildcard_search_string(wild), full_match=False), tame, re.S) is not None
