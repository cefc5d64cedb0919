"""Registry lint: find division sites that could split the engines.

Round-9's adversarial sweep caught SEVEN real bugs of ONE class: ANSI
Spark throws ``DIVIDE_BY_ZERO`` (on DOUBLE as well as integral types)
where DuckDB's double ``x / 0`` quietly yields NULL — so any division
whose denominator can reach 0 on degenerate input is a latent
engine-split.  This module mechanizes the manual "grep any new query
for unguarded ``/``" checklist step: it scans oracle SQL text for
division sites and classifies each as trivially-safe or
needs-review.

The classifier is deliberately HEURISTIC and conservative: it only
auto-passes denominators that cannot be zero by construction
(non-zero numeric literals, ``NULLIF``/``GREATEST`` wrappers) or that
sit behind an explicit comparison guard in the surrounding CASE/WHEN
context.  Everything else is reported; ``tests/test_divide_lint.py``
holds the reviewed allowlist (per-query site counts).  A new
registration with an unguarded division — or an edit that adds one to
an existing query — fails the lint until the site is either guarded
or consciously reviewed into the allowlist.
"""

from __future__ import annotations

import re

__all__ = ["strip_sql", "division_sites", "needs_review_sites"]


def strip_sql(sql: str) -> str:
    """Blank out single-quoted string literals and ``--`` comments,
    preserving positions (each removed char becomes a space) so site
    offsets refer to the original text."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2  # escaped quote inside the literal
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(" " * (min(j, n - 1) - i + 1))
            i = min(j, n - 1) + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            if j == -1:
                j = n
            out.append(" " * (j - i))
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


_NUMERIC_DEN = re.compile(r"^\(?\s*-?\d+(\.\d+)?([eE]-?\d+)?\b")
_CAST_LITERAL = re.compile(r"^CAST\(\s*-?\d", re.IGNORECASE)
_GUARD_CMP = re.compile(
    r"(>\s*0|>=\s*1|<>\s*0|!=\s*0|IS NOT NULL|>\s*1\b)", re.IGNORECASE
)


def division_sites(sql: str) -> list[tuple[int, str]]:
    """All ``/`` operator positions with a context snippet."""
    s = strip_sql(sql)
    sites = []
    for m in re.finditer(r"/", s):
        i = m.start()
        snippet = (s[max(0, i - 60):i] + "/" + s[i + 1:i + 60])
        sites.append((i, re.sub(r"\s+", " ", snippet)))
    return sites


def needs_review_sites(sql: str) -> list[str]:
    """Division sites NOT trivially safe — candidates for an ANSI
    divide-by-zero engine split.  Auto-passed:

    - non-zero numeric-literal denominators (``/ 2``, ``/ 100.0``,
      ``/ 1e6``), including ``CAST(<literal> AS ...)``;
    - ``NULLIF(...)`` / ``GREATEST(...)`` denominators;
    - sites whose preceding 250 chars contain a ``WHEN``-style
      comparison guard (``> 0``, ``>= 1``, ``<> 0``, ``!= 0``,
      ``IS NOT NULL``) — the repo's standard CASE-guard idiom.

    Everything else is returned for review.  False positives are
    expected (e.g. ``count(*)`` denominators inside GROUP BY, which
    cannot be 0) — the allowlist in the lint test records the
    reviewed verdicts; the classifier errs toward reporting because
    the r9 bugs hid in exactly the "obviously fine" shapes
    (``len(words)``, ``sum(weight)``, rate denominators).
    """
    s = strip_sql(sql)
    flagged: list[str] = []
    for m in re.finditer(r"/", s):
        i = m.start()
        after = s[i + 1:i + 120].lstrip()
        upper_after = after.upper()
        if _NUMERIC_DEN.match(after):
            continue
        if upper_after.startswith("NULLIF(") or upper_after.startswith(
            "GREATEST("
        ):
            continue
        if _CAST_LITERAL.match(after):
            continue
        before = s[max(0, i - 250):i]
        if "WHEN" in before.upper() and _GUARD_CMP.search(before):
            continue
        snippet = (s[max(0, i - 60):i] + "/" + after[:50])
        flagged.append(re.sub(r"\s+", " ", snippet).strip())
    return flagged


# ---------------------------------------------------------------------------
# Spark-side companion: the same heuristic over a Catalyst ANALYZED-plan
# rendering (round 10 — promotes scripts/divide_scan_plans.py from a
# review feed to a pinned gate; see tests/test_plan_divide_lint.py).
# ---------------------------------------------------------------------------

_PLAN_NUM = re.compile(r"^\(?\s*-?\d+(\.\d+)?([eE]-?\d+)?\b")
_PLAN_CAST_LIT = re.compile(r"^cast\(\s*-?\d", re.IGNORECASE)
_PLAN_GUARD = re.compile(
    r"(>\s*0|>=\s*1|<>\s*0|!=\s*0|isnotnull|NOT NULL|>\s*1\b)",
    re.IGNORECASE,
)


def plan_needs_review_sites(plan: str) -> list[str]:
    """Division sites in a Catalyst plan string that are not trivially
    safe — the Spark-side mirror of :func:`needs_review_sites`
    (5 of the 7 r9 engine-splits lived on THIS side: the engine's own
    expression divided by zero where the oracle yielded NULL).

    Auto-passed: literal denominators (incl. ``cast(<literal>``),
    ``nullif(``/``greatest(`` denominators, and sites within 300 chars
    after a ``CASE WHEN``/``if(`` whose condition contains a
    comparison guard.  Counts are pinned per query by the env-gated
    plan-lint test against an allowlist whose evidence base is the
    full-family adversarial differential sweep (every allowlisted
    site's query passes the real compare on its degenerate fixture).
    """
    hits: list[str] = []
    for m in re.finditer(r"/", plan):
        i = m.start()
        after = plan[i + 1:i + 120].lstrip()
        low = after.lower()
        if _PLAN_NUM.match(after) or _PLAN_CAST_LIT.match(after):
            continue
        if low.startswith("nullif(") or low.startswith("greatest("):
            continue
        before = plan[max(0, i - 300):i]
        bl = before.lower()
        if ("case when" in bl or "if(" in bl) and _PLAN_GUARD.search(before):
            continue
        snippet = re.sub(
            r"\s+", " ", plan[max(0, i - 70):i] + "/" + after[:60]
        )
        hits.append(snippet.strip())
    return hits
