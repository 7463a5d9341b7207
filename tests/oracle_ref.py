"""Pure-Python mini-oracle reimplementing the reference analyzer semantics
line-at-a-time (independent of the Spark engine's vectorized code paths).

Mirrors /root/reference/src/analyzer.rs + src/parser/{generic,json}.rs behavior
for: level/timestamp/error extraction, filter conjunction, all accumulators.
Used as the expected-value source in aggregate/golden tests.
"""

from __future__ import annotations

import json
import re
from collections import Counter

# re.ASCII pins \d\w to ASCII (Java regex and DuckDB RE2 defaults). Pattern
# whitespace uses the explicit Unicode White_Space class (WS_RE below) — the
# reference's Rust regex \s IS Unicode, so "Connection\xa0timeout" matches in
# every engine (patterns.py:WS_CLASS carries the same literal codepoints).
_WS_CPS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
WS_RE = "[" + "".join(chr(cp) for cp in _WS_CPS) + "]"

LEVEL_RE = re.compile(
    r"(\[(?i:(ERROR|WARN|INFO|DEBUG|TRACE|SEVERE|WARNING|FINE))\]"
    r"|(?i:ERROR|WARN|INFO|DEBUG|TRACE|SEVERE|WARNING|FINE):)",
    re.ASCII,
)
TS_RE = re.compile(r"(\d{4}-\d{2}-\d{2}" + WS_RE + r"+\d{2}:\d{2}:\d{2})", re.ASCII)
ERR_RE = re.compile(
    r"([A-Za-z]+Exception|[A-Za-z]+Error|[A-Za-z]+" + WS_RE + r"+timeout"
    r"|Connection timeout|500 Internal Server Error|401 Unauthorized"
    r"|503 Service Unavailable)",
    re.ASCII,
)
COMPLEX = set("*?[(|+.^$\\")

# Unicode White_Space — Rust str::trim's set (twin of functions/extract.py:_WS).
# Python's bare str.strip() would ALSO strip \x1c-\x1f (not White_Space), so
# data-path trims below pass this set explicitly.
WS = "".join(chr(cp) for cp in _WS_CPS)

TS_KEYS = ["timestamp", "time", "@timestamp", "date", "datetime"]
LEVEL_KEYS = ["level", "severity", "loglevel", "log_level", "@level"]
MSG_KEYS = ["message", "msg", "text", "description", "content"]


def _jfirst(obj, keys):
    for k in keys:
        v = obj.get(k)
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return json.dumps(v)
    return None


def parse_line(line: str, mode: str) -> dict:
    out = {"level": None, "ts": None, "message": line}
    t = line.strip(WS)
    if mode in ("json", "auto") and t.startswith("{") and (mode == "json" or t.endswith("}")):
        try:
            obj = json.loads(t)
        except ValueError:
            obj = None
        if isinstance(obj, dict):
            out["level"] = _jfirst(obj, LEVEL_KEYS)
            out["ts"] = _jfirst(obj, TS_KEYS)
            m = _jfirst(obj, MSG_KEYS)
            if m is not None:
                out["message"] = m
    return out


def extract_level(line: str, parsed_level: str | None) -> str:
    if parsed_level is not None:
        return parsed_level
    m = LEVEL_RE.search(line)
    if not m:
        return ""
    return (m.group(2) or m.group(1)).upper()


def extract_ts(line: str, parsed_ts: str | None) -> str:
    if parsed_ts is not None:
        return parsed_ts
    m = TS_RE.search(line)
    return m.group(1) if m else ""


def msg_key(line: str) -> str:
    parts = line.split("]")
    return parts[1].strip(WS) if len(parts) >= 2 else line


def analyze_lines(
    lines,
    pattern: str | None = None,
    level: str | None = None,
    fields: dict[str, str] | None = None,
    mode: str = "auto",
):
    """Returns dict of accumulators like AnalysisResult."""
    pat_re = re.compile(pattern) if pattern and any(c in COMPLEX for c in pattern) else None
    res = {
        "count": 0,
        "levels": Counter(),
        "trends": Counter(),
        "error_types": Counter(),
        "unique_messages": set(),
        "line_counts": Counter(),
    }
    for line in lines:
        if not line:
            continue
        parsed = parse_line(line, mode)
        lv = extract_level(line, parsed["level"])
        if level is not None and not (lv != "" and lv.upper() == level.upper()):
            continue
        if pattern is not None:
            ok = pat_re.search(line) if pat_re else (pattern in line)
            if not ok:
                continue
        if fields:
            ok = True
            for k, v in fields.items():
                obj = None
                t = line.strip(WS)
                if t.startswith("{"):
                    try:
                        obj = json.loads(t)
                    except ValueError:
                        obj = None
                fv = None
                if isinstance(obj, dict):
                    fv = _get_path(obj, k)
                if fv is not None:
                    if fv.strip(WS).lower() != v.strip().lower():
                        ok = False
                        break
                else:
                    ll = line.lower()
                    if not (k.strip().lower() in ll and v.strip().lower() in ll):
                        ok = False
                        break
            if not ok:
                continue
        res["count"] += 1
        res["line_counts"][line] += 1
        ts = extract_ts(line, parsed["ts"])
        if ts:
            res["trends"][ts[:13]] += 1
        res["levels"][lv] += 1
        em = ERR_RE.search(line)
        if em:
            res["error_types"][em.group(1)] += 1
        res["unique_messages"].add(msg_key(line))
    return res


def _get_path(obj, dotted: str):
    """Flattened-field lookup: a.b.c and a[0].b paths, stringified leaf values."""
    cur = obj
    for part in re.split(r"\.", dotted):
        m = re.match(r"^([^\[\]]+)((\[\d+\])*)$", part)
        if not m or not isinstance(cur, dict) or m.group(1) not in cur:
            return None
        cur = cur[m.group(1)]
        for idx in re.findall(r"\[(\d+)\]", part):
            if not isinstance(cur, list) or int(idx) >= len(cur):
                return None
            cur = cur[int(idx)]
    if isinstance(cur, bool):
        return "true" if cur else "false"
    if isinstance(cur, (int, float)):
        return json.dumps(cur)
    if isinstance(cur, str):
        return cur
    return None
