"""Keyed-merge reducers (SURVEY.md §2.7 D4/D5/D6).

Reference semantics (/root/reference/feilian/agents/reducers.py:10-47 and
agents/agent.py:43-44): right-biased upserts keyed by id / xpath, and an
ordered first-wins union.  Pure functions — used wherever partial results
merge (snippet lists, operator plans); in Ray pipelines they run inside
map_groups or driver-side merge steps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence


def replace_with_id(
    left: Sequence[Dict[str, Any]], right: Sequence[Dict[str, Any]], key: str = "id"
) -> List[Dict[str, Any]]:
    """Right side wins on key collision; left order preserved, new right
    items appended in order (reference replace_with_id, reducers.py:10-23)."""
    right_by_key = {r[key]: r for r in right}
    out: List[Dict[str, Any]] = []
    seen = set()
    for item in left:
        k = item[key]
        out.append(right_by_key.get(k, item))
        seen.add(k)
    for r in right:
        if r[key] not in seen:
            out.append(r)
            seen.add(r[key])
    return out


def merge_operators(
    left: Sequence[Dict[str, Any]], right: Sequence[Dict[str, Any]]
) -> List[Dict[str, Any]]:
    """Operator-plan merge keyed by xpath, right priority
    (reference merge_operators, reducers.py:30-47)."""
    return replace_with_id(left, right, key="xpath")


def unique_merge(left: Sequence[Any], right: Sequence[Any]) -> List[Any]:
    """Ordered union, first occurrence wins (reference unique_merge,
    agents/agent.py:43-44: list(dict.fromkeys(x + y)))."""
    return list(dict.fromkeys(list(left) + list(right)))
