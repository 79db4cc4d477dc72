"""Property tests for the search planner: candidate pruning must be SOUND
(never drops a true match) — the confirm filter restores exactness."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from clp_spark.functions.tokenizer import encode_text
from clp_spark.functions.wildcard import wildcard_to_regex
from clp_spark.plans.grep import (
    _template_to_pattern,
    normalize_query,
    patterns_intersect,
    query_var_candidates,
)

# message pieces: tokens that exercise int/float/dict/hex/static paths
PIECES = st.sampled_from(
    ["alpha", "x9", "123", "4.5", "deadbeef", "0x1F", "007", "conv-01", "=", " ", ", "]
)
MESSAGES = st.lists(PIECES, min_size=1, max_size=8).map("".join)
QUERY_PIECES = st.sampled_from(
    ["alpha", "x9", "123", "4.5", "dead", "*", "?", " ", "beef"]
)
QUERIES = st.lists(QUERY_PIECES, min_size=1, max_size=5).map("".join)


@settings(max_examples=400, deadline=None)
@given(MESSAGES, QUERIES)
def test_candidate_pruning_is_sound(message, query):
    """If the normalized query matches a message's text, the message's
    logtype MUST survive the dictionary prune (clp/GrepCore candidate
    generation can over-approximate, never under-approximate)."""
    q = normalize_query(query)
    if not re.fullmatch(wildcard_to_regex(q).join(["(?s)", ""]), message):
        return  # not a true match; nothing to assert
    logtype = encode_text(message)[0]
    assert patterns_intersect(q, _template_to_pattern(logtype)), (
        message, query, logtype,
    )


@settings(max_examples=300, deadline=None)
@given(MESSAGES, QUERIES)
def test_var_slots_are_subsequence_of_match(message, query):
    """Every var-candidate slot the planner derives from the query must be
    satisfiable by a true-matching message's encoded variables, in order
    (soundness of the encoded-var sequence prune)."""
    q = normalize_query(query)
    if not re.fullmatch("(?s)" + wildcard_to_regex(q), message):
        return
    lt, vt, dv, en = encode_text(message)
    # var dict = exactly this message's dict vars (hashed by index)
    var_rows = [(hash(s) & 0x7FFFFFFF, s) for s in set(dv)]
    by_val = dict((s, h) for h, s in var_rows)
    slots = query_var_candidates(query, var_rows)
    # message's merged var sequence under the same ids
    seq = []
    di = 0
    for t, n in zip(vt, en):
        if n is None:
            seq.append(by_val[dv[di]])
            di += 1
        else:
            seq.append(n)
    # greedy subsequence check must succeed
    idx = 0
    for v in seq:
        if idx < len(slots) and v in slots[idx]:
            idx += 1
    assert idx >= len(slots), (message, query, slots, seq)


@settings(max_examples=400, deadline=None)
@given(MESSAGES, QUERIES)
def test_wont_match_is_sound(message, query):
    """query_wont_match may only fire when NO message matches — if the query
    regex-matches this message, the precheck over this message's own
    dictionaries must pass."""
    from clp_spark.plans.grep import query_wont_match

    q = normalize_query(query)
    if not re.fullmatch("(?s)" + wildcard_to_regex(q), message):
        return
    lt, vt, dv, en = encode_text(message)
    assert not query_wont_match(query, [lt], list(dv)), (message, query, lt, dv)
