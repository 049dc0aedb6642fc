"""Scope filter — willCrawl parity (/root/reference/crawler/
crawler.go:171-195, README.md:126-141).

Three rules, in order: (1) any exclude match -> drop; (2) any include
match -> keep; (3) keep iff the include list is empty.

Two implementations sharing one semantics:
- ``will_crawl``: pure Python (oracle / driver-side seeds).
- ``scope_filter_expr``: a pure Column expression (rlike composition,
  no UDF) so Catalyst can pipeline it inside WholeStageCodegen —
  SURVEY.md A6.

Note on regex dialect: Go uses RE2, Spark rlike uses Java regex,
Python uses ``re``. For the supported pattern subset (anchors,
character classes, alternation, quantifiers — what crawl configs use)
the three agree; backreferences/lookaround are rejected to keep the
cross-dialect contract honest.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["will_crawl", "scope_filter_expr", "check_patterns"]

_UNSUPPORTED = re.compile(r"\(\?[<=!]|\\[0-9]")


def check_patterns(patterns: list[str]) -> list[str]:
    for p in patterns:
        if _UNSUPPORTED.search(p):
            raise ValueError(f"pattern {p!r} uses constructs outside the RE2-safe subset")
        re.compile(p)  # parity: MustCompile panics on bad pattern (crawler.go:158-166)
    return patterns


def will_crawl(full_url: str, include: list[str], exclude: list[str]) -> bool:
    for p in exclude:
        if re.search(p, full_url):
            return False
    for p in include:
        if re.search(p, full_url):
            return True
    return len(include) == 0


def scope_filter_expr(url_col: Column, include: list[str], exclude: list[str]) -> Column:
    """Column-only willCrawl: ~any(rlike(exclude)) & (any(rlike(include)) | include-empty)."""
    keep = F.lit(True)
    for p in exclude:
        keep = keep & ~url_col.rlike(p)
    if include:
        inc = F.lit(False)
        for p in include:
            inc = inc | url_col.rlike(p)
        keep = keep & inc
    return keep
