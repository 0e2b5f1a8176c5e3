"""LLM-output JSON repair (SURVEY F2).

The reference hardens LLM responses before json.loads: stripping markdown
fences / "json" tags and escaping unescaped inner quotes character by
character (core/src/core/utils/str_util.py:8-133 — semantics re-implemented
here from the survey's behavioral description, not copied). Exposed both as
plain Python (unit-testable, reusable in any parser) and as a vectorized
pandas UDF for use ahead of ``from_json``.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def strip_markdown_fences(s: str) -> str:
    """Remove ``` fences and an optional language tag on the fence line.

    The tag is stripped only when it is the WHOLE first line (optionally
    padded) — content that merely STARTS with the letters 'json'
    ('jsonify ...') must survive intact, and longer tags like 'jsonl'
    are removed whole rather than having 4 characters sliced off."""
    import re as _re

    t = s.strip()
    if t.startswith("```"):
        t = t[3:]
        m = _re.match(r"[ \t]*json[a-z0-9]*[ \t]*(\n|$)", t, _re.IGNORECASE)
        if m:
            t = t[m.end():]
        if t.rstrip().endswith("```"):
            t = t.rstrip()[:-3]
    return t.strip()


def escape_inner_quotes_in_array(s: str) -> str:
    """Make a JSON array of strings parse-safe when element text contains
    unescaped double quotes.

    Walks the string tracking whether we are inside a string element; a
    quote inside an element is treated as a terminator only when followed
    (after whitespace) by a structural character (, ] :). Otherwise it is
    escaped. This is the reference's hard-won heuristic for LLM emissions
    like ["a "quoted" phrase"].
    """
    out: list[str] = []
    in_str = False
    i = 0
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and in_str and i + 1 < n:
            out.append(ch)
            out.append(s[i + 1])
            i += 2
            continue
        if ch == '"':
            if not in_str:
                in_str = True
                out.append(ch)
            else:
                j = i + 1
                while j < n and s[j] in " \t\r\n":
                    j += 1
                if j >= n or s[j] in ",]}:":
                    in_str = False
                    out.append(ch)
                else:
                    out.append('\\"')
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def repair_json(s: str) -> str:
    """Full repair pipeline: fences -> quote escaping (only if needed)."""
    t = strip_markdown_fences(s)
    try:
        json.loads(t)
        return t
    except (json.JSONDecodeError, ValueError):
        return escape_inner_quotes_in_array(t)


def parse_json_array(s: str) -> list[str] | None:
    """Parse an LLM 'JSON array of strings' response; None when hopeless."""
    try:
        v = json.loads(repair_json(s))
    except (json.JSONDecodeError, ValueError):
        return None
    if isinstance(v, list):
        return [str(x) for x in v]
    return None


@F.pandas_udf(T.StringType())
def repair_json_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return s.map(lambda x: repair_json(x) if x is not None else None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_json_array_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    return s.map(lambda x: parse_json_array(x) if x is not None else None)
