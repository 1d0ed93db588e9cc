"""Static dialect audit of every registered DuckDB oracle.

Round 3 proved local-green != driver-green: three queries hash-failed at
the driver while passing the pinned local DuckDB 1.0.0, and the diagnosed
causes were version-sensitive SQL constructs (double->decimal casts of
arbitrary doubles, correlated scalar subqueries / NOT IN, HUGEINT
reaching result columns). A second DuckDB version cannot be installed in
this environment, so this tool is the substitute: it sweeps all oracle
SQL for the constructs known to drift across DuckDB releases and fails
loudly on the high-risk ones.

Checks (H = high risk, fails the audit; I = informational):

  H1  double->decimal: CAST of an expression containing a float division
      onto DECIMAL — the rounding PATH differs between engines/versions
      for arbitrary doubles (functions/exact.py numeric contract; the
      exact defect behind r3's q_corpus_prep_pipeline red).
  H2  NOT IN (SELECT ...): NULL semantics + historical planner bugs;
      rewrite as NOT EXISTS / anti-join.
  H3  NON-AGGREGATE scalar subquery in expression position ("= (SELECT
      col FROM one_row_cte)", "+ (SELECT ...)"): DuckDB 1.1 changed
      multi-row scalar-subquery behavior from first-row to error, and
      single-row-ness of a bare column select rests on construction, not
      syntax (the exact r3 q_pagerank hazard); CROSS JOIN the 1-row CTE
      instead. Aggregate-headed subqueries (SELECT COUNT/SUM/MIN/MAX...)
      are exempt — an ungrouped aggregate returns exactly one row in
      every version.
  I1  bare SUM(...) as a result column with no CAST: DuckDB SUM(BIGINT)
      returns HUGEINT (fetchdf -> float64/object), Spark returns long —
      a schema/value skew trap. (Informational: the harness's column
      compare coerces, but new oracles should CAST.)
  I2  list_sort without explicit ordering arguments (NULL-order default
      drifted across releases).
  I3  float floor-division: CAST(... AS DOUBLE) feeding // .

Run:  python tools/audit_oracles.py        (exit 1 on any H finding)
"""

from __future__ import annotations

import os
import re
import sys


def _strip_strings(sql: str) -> str:
    """Blank out string literals so regexes don't fire inside them."""
    return re.sub(r"'[^']*'", "''", sql)


def audit_one(name: str, sql: str) -> list[tuple[str, str, str]]:
    """-> [(severity, check, detail)]."""
    findings = []
    s = _strip_strings(sql)

    # H1: decimal cast whose inner expression contains a float division.
    for m in re.finditer(r"CAST\s*\(", s, re.I):
        # capture the balanced argument of this CAST
        depth, i = 1, m.end()
        while i < len(s) and depth:
            depth += {"(": 1, ")": -1}.get(s[i], 0)
            i += 1
        arg = s[m.end():i - 1]
        if re.search(r"AS\s+DECIMAL", arg, re.I) and "/" in \
                arg.split(" AS ")[0] and "//" not in arg:
            findings.append((
                "H", "H1-double-to-decimal",
                f"CAST(...{arg[:60]}... AS DECIMAL) over a float "
                "division — engine-dependent rounding path"))

    if re.search(r"NOT\s+IN\s*\(\s*SELECT", s, re.I):
        findings.append(("H", "H2-not-in-subquery",
                         "NOT IN (SELECT ...) — use NOT EXISTS"))

    agg_head = re.compile(
        r"SELECT\s+(DISTINCT\s+)?(CAST\s*\(\s*)?(COALESCE\s*\(\s*)?"
        r"(COUNT|SUM|MIN|MAX|AVG|ANY_VALUE|ARBITRARY)\s*\(", re.I)
    for m in re.finditer(r"([=+\-*/]|//)\s*\(\s*(SELECT\b)", s, re.I):
        inner = s[m.start(2):m.start(2) + 120]
        if agg_head.match(inner):
            continue  # ungrouped aggregate: exactly one row, all versions
        findings.append((
            "H", "H3-scalar-subquery",
            f"non-aggregate scalar subquery in expression position near "
            f"...{s[max(0, m.start() - 30):m.start()]!r}"))

    # I1: top-level result column that is a bare SUM( with no CAST around
    # it. Scan only the final SELECT list (after the last top-level
    # SELECT keyword) to keep noise down.
    tail = s[s.upper().rfind("SELECT"):]
    for m in re.finditer(r"(?<![A-Z_])SUM\s*\(", tail, re.I):
        before = tail[max(0, m.start() - 24):m.start()].upper()
        if "CAST" not in before and "//" not in tail[m.end():m.end() + 80]:
            findings.append(("I", "I1-bare-sum",
                             "result-column SUM without CAST "
                             "(HUGEINT reaches fetchdf)"))
            break

    if re.search(r"list_sort\s*\([^,)]*\)", s, re.I):
        findings.append(("I", "I2-list-sort-default",
                         "list_sort with default ordering flags"))

    if re.search(r"AS\s+DOUBLE\s*\)\s*//", s, re.I):
        findings.append(("I", "I3-float-floordiv",
                         "float value feeding // floor-division"))

    return findings


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    n_h = n_i = 0
    lines = []
    for name, sql in oracles.items():
        for sev, check, detail in audit_one(name, sql):
            if sev == "H":
                n_h += 1
            else:
                n_i += 1
            lines.append(f"{sev}  {name}  [{check}]  {detail}")
    for ln in sorted(lines):
        print(ln)
    print(f"\n{len(oracles)} oracles audited: {n_h} high-risk, "
          f"{n_i} informational")
    return 1 if n_h else 0


if __name__ == "__main__":
    raise SystemExit(main())
