"""Timestamp pattern table: parse text-embedded timestamps, render them back
byte-exactly, and stitch multi-line messages.

Reference semantics (re-derived, NOT ported):
  - ~33 known patterns tried in order until one matches
    (reference components/core/src/clp/TimestampPattern.cpp:120-202);
  - a match records (pattern_id, epoch_millis, position) so decompression
    re-renders the original text byte-for-byte
    (reference clp/TimestampPattern.cpp insert_formatted_timestamp,
    clp/streaming_archive/reader/Archive.cpp:163-195);
  - message boundary rule: a line that parses a timestamp starts a new
    message; non-timestamped lines glue onto the previous message
    (reference clp/MessageParser.cpp:84-165).

Spark-first: pattern matching is vectorized per Arrow batch — each pattern
is one compiled regex applied to the still-unmatched rows (pandas .str
C loops), mirroring the reference's ordered linear scan without per-row
Python. Message stitching is a pure DataFrame window operation.

The pattern table is a representative subset of the reference's list
(same ordering discipline: more specific first). Extend by appending
(regex, strftime-ish renderer) pairs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class TsPattern:
    """One known timestamp pattern: a capture regex and a render format.

    `fmt` uses strftime codes plus %3 for milliseconds (the reference's
    extension, TimestampPattern.cpp) — rendering is exact for round trips.
    """

    pattern_id: int
    regex: str
    fmt: str


# Order matters (first match wins), like the reference's static list.
# pattern_id == list index (asserted below; render_timestamp indexes by id).
#
# The table covers the reference's full init() list
# (clp/TimestampPattern.cpp:120-202). Layout: ids 0-16 are the original
# round-1 subset (ids are PERSISTED in stitched archives — appending keeps
# them stable); 17+ complete the reference list in its own relative order.
# %e = space-padded day, %k = space-padded hour, %l = unpadded 12-hour,
# %#3 = bare millisecond counter (the reference's "imprecise" catch-all).
# Deviations (documented, round-trip-safe): bracketed variants like
# "[%Y-%m-%d %H:%M:%S,%3]" are matched by their UNBRACKETED pattern first
# (brackets stay message text — byte-identical output either way), and the
# %#3 catch-all is capped at 9 digits so it can never shadow the epoch
# second/milli patterns.
_MONTHS_FULL = (
    "January|February|March|April|May|June|July|August|September|October|"
    "November|December"
)
_E_DAY = r"(?: [1-9]|[12]\d|3[01])"  # %e: space-padded 1-9, else two digits
_PATTERN_SPECS = [
    # 2016-05-08 07:34:05.251000 (ms-precision micros; last 3 digits must be
    # zero or the stored epoch-ms could not re-render the original bytes)
    (r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}000", "%Y-%m-%d %H:%M:%S.%3000"),
    # 2016-05-08T07:34:05.251 / 2016-05-08 07:34:05.251
    (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}", "%Y-%m-%dT%H:%M:%S.%3"),
    (r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}", "%Y-%m-%d %H:%M:%S.%3"),
    # comma millis
    (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2},\d{3}", "%Y-%m-%dT%H:%M:%S,%3"),
    (r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}", "%Y-%m-%d %H:%M:%S,%3"),
    # seconds precision
    (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}", "%Y-%m-%dT%H:%M:%S"),
    (r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", "%Y-%m-%d %H:%M:%S"),
    # 08/May/2016:07:34:05 +0000 (apache clf, offset kept as message text;
    # also covers the reference's "[%d/%b/%Y:%H:%M:%S" — bracket stays text)
    (r"\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2}", "%d/%b/%Y:%H:%M:%S"),
    # 08-May-2016 07:34:05.251 (java util logging)
    (r"\d{2}-[A-Z][a-z]{2}-\d{4} \d{2}:\d{2}:\d{2}\.\d{3}", "%d-%b-%Y %H:%M:%S.%3"),
    # Sun May  8 07:34:05 2016 (apache error log / asctime)
    (rf"[A-Z][a-z]{{2}} [A-Z][a-z]{{2}} {_E_DAY} \d{{2}}:\d{{2}}:\d{{2}} \d{{4}}",
     "%a %b %e %H:%M:%S %Y"),
    # May  8 07:34:05 (syslog, no year -> 1970)
    (rf"[A-Z][a-z]{{2}} {_E_DAY} \d{{2}}:\d{{2}}:\d{{2}}", "%b %e %H:%M:%S"),
    # 05/08/2016 07:34:05
    (r"\d{2}/\d{2}/\d{4} \d{2}:\d{2}:\d{2}", "%m/%d/%Y %H:%M:%S"),
    # 16/05/08 07:34:05 (two-digit year — spark/hadoop log4j default)
    (r"\d{2}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}", "%y/%m/%d %H:%M:%S"),
    # 08.05.2016 07:34:05 (dotted European)
    (r"\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}:\d{2}", "%d.%m.%Y %H:%M:%S"),
    # 20160508073405 compact — MUST precede the 13-digit epoch pattern
    (r"\d{14}", "%Y%m%d%H%M%S"),
    # epoch millis / epoch seconds
    (r"\d{13}", "%EPOCH_MS"),
    (r"\d{10}", "%EPOCH_S"),
    # ---- ids 17+: remainder of the reference list (appended; reference-
    # relative order preserved within this block) -------------------------
    # 2015/01/31T15:50:45.123 et al (slash dates with millis)
    (r"\d{4}/\d{2}/\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}", "%Y/%m/%dT%H:%M:%S.%3"),
    (r"\d{4}/\d{2}/\d{2}T\d{2}:\d{2}:\d{2},\d{3}", "%Y/%m/%dT%H:%M:%S,%3"),
    (r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}\.\d{3}", "%Y/%m/%d %H:%M:%S.%3"),
    (r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2},\d{3}", "%Y/%m/%d %H:%M:%S,%3"),
    # <<<2016-11-10 03:02:29:936
    (r"<<<\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}:\d{3}", "<<<%Y-%m-%d %H:%M:%S:%3"),
    # 01 Jan 2016 15:50:17,085
    (r"\d{2} [A-Z][a-z]{2} \d{4} \d{2}:\d{2}:\d{2},\d{3}", "%d %b %Y %H:%M:%S,%3"),
    # slash dates, seconds precision
    (r"\d{4}/\d{2}/\d{2}T\d{2}:\d{2}:\d{2}", "%Y/%m/%dT%H:%M:%S"),
    (r"\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}", "%Y/%m/%d %H:%M:%S"),
    # [20170106-16:56:41]
    (r"\[\d{8}-\d{2}:\d{2}:\d{2}\]", "[%Y%m%d-%H:%M:%S]"),
    # Start-Date: 2015-01-31  15:50:45 (double space)
    (r"\d{4}-\d{2}-\d{2}  \d{2}:\d{2}:\d{2}", "%Y-%m-%d  %H:%M:%S"),
    # 150131  9:50:45 (%k = space-padded hour)
    (r"\d{6} (?: \d|1\d|2[0-3]):\d{2}:\d{2}", "%y%m%d %k:%M:%S"),
    # Jan 01, 2016 3:50:17 PM (%l = unpadded 12-hour)
    (r"[A-Z][a-z]{2} \d{2}, \d{4} (?:[1-9]|1[0-2]):\d{2}:\d{2} [AP]M",
     "%b %d, %Y %l:%M:%S %p"),
    # January 31, 2015 15:50
    (rf"(?:{_MONTHS_FULL}) \d{{2}}, \d{{4}} \d{{2}}:\d{{2}}", "%B %d, %Y %H:%M"),
    # 192.168.4.5 - - [01/01/2016:15:50:17 (numeric-month CLF)
    (r"\[\d{2}/\d{2}/\d{4}:\d{2}:\d{2}:\d{2}", "[%d/%m/%Y:%H:%M:%S"),
    # Jan 01 11:56:42 (ZERO-padded day syslog; %e above covers " 1"/"21")
    (r"[A-Z][a-z]{2} 0[1-9] \d{2}:\d{2}:\d{2}", "%b %d %H:%M:%S"),
    # 01-21 11:56:42.392 (no year)
    (r"\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}", "%m-%d %H:%M:%S.%3"),
    # 916321 — bare millisecond counter (the reference's %#3 catch-all;
    # capped at 9 digits so epoch second/milli runs never land here)
    (r"[1-9]\d{2,8}", "%#3"),
]

PATTERNS: list[TsPattern] = [
    TsPattern(i, rx, fmt) for i, (rx, fmt) in enumerate(_PATTERN_SPECS)
]


def _anchored(rx: str) -> str:
    """Digit-boundary anchors: a pattern must not match INSIDE a longer digit
    run (a 16-digit id must not yield a 13/14-digit "timestamp" prefix —
    the reference tokenizes first so its patterns see whole tokens)."""
    return f"(?<!\\d){rx}(?!\\d)"


_COMPILED = [(p, re.compile(_anchored(p.regex))) for p in PATTERNS]
_SEARCH_COMPILED = _COMPILED


def _parse_match(p: TsPattern, s: str) -> int:
    """Matched text -> epoch millis (UTC, like the reference's epochtime)."""
    if p.fmt == "%EPOCH_MS":
        return int(s)
    if p.fmt == "%EPOCH_S":
        return int(s) * 1000
    if p.fmt == "%#3":  # bare millisecond counter, stored as-is
        return int(s)
    fmt = p.fmt
    ms = 0
    if fmt.endswith("%3000"):  # ms-precision microseconds: .dddddd, ddd == 0
        ms = int(s[-6:-3])
        s = s[:-7]
        fmt = fmt[: -len(".%3000")]
    elif "%3" in fmt:
        ms = int(s[-3:])
        s = s[:-4]
        fmt = fmt[:-3].rstrip(".,:").replace("%3", "")
        fmt = fmt.rstrip(".,:")
    # %e/%k/%l are render-side concepts; Python strptime's %d/%H/%I accept
    # 1-2 digits and format whitespace matches runs of spaces, so padded
    # inputs parse directly.
    fmt = fmt.replace("%e", "%d").replace("%k", "%H").replace("%l", "%I")
    dt = datetime.strptime(s, fmt)
    if dt.year == 1900:  # no-year patterns (syslog): reference stores as-is
        dt = dt.replace(year=1970)
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000) + ms


def render_timestamp(pattern_id: int, ts_ms: int) -> str:
    """Exact inverse of _parse_match for round-trip decode
    (reference insert_formatted_timestamp)."""
    p = PATTERNS[pattern_id]
    if p.fmt == "%EPOCH_MS":
        return str(ts_ms)
    if p.fmt == "%EPOCH_S":
        return str(ts_ms // 1000)
    if p.fmt == "%#3":
        return str(ts_ms)
    dt = datetime.fromtimestamp(ts_ms / 1000, tz=timezone.utc)
    fmt = p.fmt.replace("%3", f"{ts_ms % 1000:03d}")
    fmt = fmt.replace("%e", f"{dt.day:2d}")  # space-padded day, portable
    fmt = fmt.replace("%k", f"{dt.hour:2d}")  # space-padded hour
    h12 = dt.hour % 12 or 12
    fmt = fmt.replace("%l", str(h12))  # unpadded 12-hour
    return dt.strftime(fmt)


def search_timestamp_batch(lines: pd.Series) -> pd.DataFrame:
    """Vectorized analog of search_known_ts_patterns
    (reference clp/TimestampPattern.cpp:204-218).

    Returns DataFrame(pattern_id:int64 (-1 = none), ts_ms:int64, ts_start,
    ts_end) — the span lets callers split the line into (prefix, ts, rest)
    for byte-exact reassembly. Each pattern is applied with one compiled
    C-level regex pass over the rows still unmatched.
    """
    n = len(lines)
    s = lines.fillna("")
    pattern_id = np.full(n, -1, dtype=np.int64)
    ts_ms = np.zeros(n, dtype=np.int64)
    ts_start = np.full(n, -1, dtype=np.int64)
    ts_end = np.full(n, -1, dtype=np.int64)
    unmatched = np.ones(n, dtype=bool)

    for p, rx in _SEARCH_COMPILED:
        if not unmatched.any():
            break
        sub = s[unmatched]
        # one C pass: first match span per row
        m = sub.str.extract(f"({_anchored(p.regex)})", expand=False)
        hit = m.notna().to_numpy()
        if not hit.any():
            continue
        idx = np.flatnonzero(unmatched)[hit]
        matched_strs = m[hit]
        # positions: str.find per row against its own match (C-level loop)
        pos = np.fromiter(
            (a.find(b) for a, b in zip(sub[hit], matched_strs)),
            count=len(idx),
            dtype=np.int64,
        )
        # a regex hit that fails semantic parse (month 31, overflow) falls
        # through to the NEXT pattern / unmatched instead of crashing the job
        vals = np.empty(len(idx), dtype=np.int64)
        ok = np.ones(len(idx), dtype=bool)
        for k, b in enumerate(matched_strs):
            try:
                vals[k] = _parse_match(p, b)
            except (ValueError, OverflowError, OSError):
                ok[k] = False
        idx, pos, vals = idx[ok], pos[ok], vals[ok]
        if not len(idx):
            continue
        pattern_id[idx] = p.pattern_id
        ts_ms[idx] = vals
        ts_start[idx] = pos
        ts_end[idx] = pos + matched_strs.str.len().to_numpy()[ok]
        unmatched[idx] = False

    return pd.DataFrame(
        {"pattern_id": pattern_id, "ts_ms": ts_ms, "ts_start": ts_start, "ts_end": ts_end},
        index=lines.index,
    )
