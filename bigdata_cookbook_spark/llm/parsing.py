"""LLM response parsing and consolidation (SURVEY.md §2.8 F13, §2.9 L10).

Reference: labeling.py:199-223 (JSON → {id: {label, motivation}}),
labels.py:344-367 (brace-repair of truncated completions), labels.py:
203-277 (consolidation of multi-part completions when the model splits
its answer). Engine stance (SURVEY §7 quirks): structured parsing with
declared shapes, never eval().
"""

from __future__ import annotations

import json


def repair_json_fragment(raw: str) -> str:
    """Brace-repair a truncated JSON object: trim trailing garbage after
    the last complete value and close unbalanced braces. Returns the
    repaired string (may still fail to parse — caller decides)."""
    s = (raw or "").strip()
    if not s:
        return "{}"
    if not s.startswith("{"):
        start = s.find("{")
        s = s[start:] if start != -1 else "{}"
    depth = 0
    last_complete = -1
    in_str = False
    esc = False
    for i, ch in enumerate(s):
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if ch == '"':
            in_str = not in_str
            continue
        if in_str:
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return s[: i + 1]
            if depth == 1:
                last_complete = i
    if last_complete != -1:
        return s[: last_complete + 1].rstrip().rstrip(",") + "}"
    return s + "}" * max(depth, 0)


def parse_label_response(raw: str) -> dict[str, dict]:
    """F13: one completion -> {id: {label, motivation}}; tolerates
    truncation via brace repair; non-dict values are dropped."""
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, TypeError):
        try:
            obj = json.loads(repair_json_fragment(raw))
        except json.JSONDecodeError:
            return {}
    if not isinstance(obj, dict):
        return {}
    return {
        str(k): v
        for k, v in obj.items()
        if isinstance(v, dict) and ("label" in v or "motivation" in v)
    }


def consolidate_parts(parts: list[str]) -> dict[str, dict]:
    """L10: merge multi-part/split completions into one id->result map.
    Later parts win on id collision (the reference re-requests missing
    ids, so the newest answer is authoritative)."""
    out: dict[str, dict] = {}
    for p in parts:
        out.update(parse_label_response(p))
    return out
