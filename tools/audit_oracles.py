"""Audit of every registered DuckDB oracle: executed types + dialect.

Round 3/4 proved local-green != driver-green twice, and round 4's
root-cause (established by the judge, confirmed here) was a *type*
defect invisible to value comparison: DuckDB ``SUM(BIGINT)`` returns
HUGEINT (int128); the driver hashes typed values so int128 != Spark's
int64 -> ``hash_match: false``, while the local replica's ``fetchdf()``
silently coerced HUGEINT -> float64 and float-equated. The round-4
version of this tool had exactly that mechanism catalogued as an
*informational* regex check (I1) — demoted on the reasoning that "the
harness's column compare coerces". The harness did; the driver doesn't.

This version promotes it to the failing check H4 and implements it the
only way that measured correctly: EXECUTE the type derivation. For every
oracle we ``con.sql(oracle)`` against the sf0.01 views and inspect
``rel.types`` (lazy — plans without fetching). Any result column whose
DuckDB logical type is outside the Spark-representable allowlist fails
the audit. The judge ran this exact audit in the round-4 review: it
reproduces the driver verdict with zero false positives and zero false
negatives across all 157 driver-checked queries (the old regex I1 both
missed 3 of the 5 actual reds — window-SUMs flowing through CTEs — and
false-positived on driver-green queries whose sums were cast upstream).

Empirical equivalence (probed against the union of driver-green rows in
CORRECTNESS_r01..r04): the driver tolerates integer-width skew (DuckDB
BIGINT vs Spark int is green 18 times) but not int128. So the allowlist
is family-level: {TINYINT..BIGINT, DOUBLE/FLOAT, VARCHAR, DATE,
TIMESTAMP*, BOOLEAN, INTERVAL-free}; HUGEINT/UHUGEINT/DECIMAL/BLOB/
LIST/STRUCT all fail (oracles must cast to a scalar Spark twin).

Static dialect checks retained from round 4 (H = fails audit,
I = informational):

  H1  double->decimal: CAST of an expression containing a float division
      onto DECIMAL — engine-dependent rounding path (the r3
      q_corpus_prep_pipeline defect).
  H2  NOT IN (SELECT ...): NULL semantics + historical planner bugs.
  H3  NON-AGGREGATE scalar subquery in expression position OR bare in
      select-list position: DuckDB 1.1 changed multi-row scalar-subquery
      behavior from first-row to error (the r3 q_pagerank hazard).
      Aggregate-headed subqueries are exempt (always exactly one row).
  I2  list_sort without explicit ordering arguments.
  I3  float floor-division.

Run:  python tools/audit_oracles.py        (exit 1 on any H finding)
"""

from __future__ import annotations

import os
import re
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF", "/root/testdata/sf0.01")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB logical types that map 1:1 onto a Spark scalar type the driver
# hashes identically. Everything else (HUGEINT, UHUGEINT, DECIMAL(x,y),
# BLOB, LIST, STRUCT, UUID, INTERVAL, ...) fails H4.
_ALLOWED_EXACT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER",
    "FLOAT", "DOUBLE", "VARCHAR", "DATE", "BOOLEAN",
}
_ALLOWED_PREFIX = ("TIMESTAMP",)  # TIMESTAMP, TIMESTAMP_NS, TIMESTAMP WITH ..


def _type_ok(ts: str) -> bool:
    return ts in _ALLOWED_EXACT or ts.startswith(_ALLOWED_PREFIX)


def _strip_strings(sql: str) -> str:
    """Blank out string literals so regexes don't fire inside them."""
    return re.sub(r"'[^']*'", "''", sql)


def audit_static(name: str, sql: str) -> list[tuple[str, str, str]]:
    """Static dialect sweep -> [(severity, check, detail)]."""
    findings = []
    s = _strip_strings(sql)

    # H1: decimal cast whose inner expression contains a float division.
    for m in re.finditer(r"CAST\s*\(", s, re.I):
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
    # expression position (after an operator) AND bare select-list
    # position (after SELECT or a select-list comma) — the round-4
    # version only matched the former, so 'SELECT (SELECT col FROM
    # one_row) AS x' passed silently (ADVICE r4). A comma is select-list
    # position only if the nearest preceding SELECT/FROM keyword at the
    # SAME paren depth is SELECT — a comma after FROM is a cross-join
    # list item ('FROM sigs, (SELECT unnest(...))'), not a scalar
    # subquery.
    depth_at = []
    d = 0
    for ch in s:
        depth_at.append(d)
        d += {"(": 1, ")": -1}.get(ch, 0)
    clause_kw = [(m.start(), m.group(1).upper())
                 for m in re.finditer(r"\b(SELECT|FROM)\b", s, re.I)]

    def _select_list_pos(p: int) -> bool:
        dp = depth_at[p]
        last = None
        for pos, kw in clause_kw:
            if pos >= p:
                break
            if depth_at[pos] == dp:
                last = kw
        return last == "SELECT"

    for m in re.finditer(
            r"(?:([=+\-*/]|//)|(SELECT|,))\s*\(\s*(SELECT\b)", s, re.I):
        inner = s[m.start(3):m.start(3) + 120]
        if agg_head.match(inner):
            continue  # ungrouped aggregate: exactly one row, all versions
        if m.group(2) == "," and not _select_list_pos(m.start(2)):
            continue  # FROM-list comma: cross join, not a scalar subquery
        findings.append((
            "H", "H3-scalar-subquery",
            f"non-aggregate scalar subquery near "
            f"...{s[max(0, m.start() - 30):m.start()]!r}"))

    # I2: list_sort without explicit (order, null_order) flags — count
    # TOP-LEVEL commas of the balanced argument list (a plain regex
    # false-positives on nested calls like list_sort(list(DISTINCT x),
    # 'ASC', 'NULLS FIRST')).
    for m in re.finditer(r"list_sort\s*\(", s, re.I):
        depth, i, commas = 1, m.end(), 0
        while i < len(s) and depth:
            ch = s[i]
            depth += {"(": 1, ")": -1}.get(ch, 0)
            if ch == "," and depth == 1:
                commas += 1
            i += 1
        if commas < 2:
            findings.append(("I", "I2-list-sort-default",
                             "list_sort with default ordering flags"))

    if re.search(r"AS\s+DOUBLE\s*\)\s*//", s, re.I):
        findings.append(("I", "I3-float-floordiv",
                         "float value feeding // floor-division"))

    return findings


def audit_types(con, name: str, sql: str) -> list[tuple[str, str, str]]:
    """H4: executed result-type audit (plans the query, no fetch)."""
    try:
        rel = con.sql(sql)
    except Exception as e:  # noqa: BLE001
        return [("H", "H4-prepare-error",
                 f"oracle fails to prepare: {str(e)[:160]}")]
    return [
        ("H", "H4-result-type",
         f"result column {col!r} has DuckDB type {ts} — not "
         f"Spark-representable; CAST it (HUGEINT/DECIMAL hash-red "
         f"at the driver)")
        for col, typ in zip(rel.columns, rel.types)
        if not _type_ok(ts := str(typ))
    ]


def connect(sf_dir: str = SF_DIR):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    con = connect()
    oracles = entrymod.oracle_sql()
    n_h = n_i = 0
    lines = []
    for name, sql in oracles.items():
        for sev, check, detail in (audit_static(name, sql)
                                   + audit_types(con, name, sql)):
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
