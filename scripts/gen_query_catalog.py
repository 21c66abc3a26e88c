#!/usr/bin/env python3
"""Regenerate docs/query_catalog.md from the live query registry.

One row per registered query in driver execution order: name, module,
gate type, first docstring line. Run after any window rotation or query
addition so the catalog never drifts from the registry.

Usage: PYTHONPATH=/root/repo python scripts/gen_query_catalog.py
"""

from __future__ import annotations

import inspect

from kafka_streams_common_spark import queries as q


def main() -> None:
    rows = []
    for name, fn in q.QUERIES.items():
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (inspect.getdoc(fn) or "").split("\n")[0].strip()
        if len(doc) > 110:
            doc = doc[:107] + "..."
        gate = "SQL oracle" if name in q.ORACLES else "rows-only"
        rows.append((name, mod, gate, doc))

    window, rest = rows[:50], rows[50:]

    def table(rws, offset=0):
        out = ["| # | query | module | gate | summary |", "|---|---|---|---|---|"]
        for i, (n, m, g, d) in enumerate(rws, offset + 1):
            out.append(f"| {i} | `{n}` | {m} | {g} | {d} |")
        return "\n".join(out)

    n_oracle = sum(1 for r in rows if r[2] == "SQL oracle")
    body = f"""# Query catalog (generated)

Generated from the live registry by `scripts/gen_query_catalog.py` —
one row per registered query, in driver execution order. {len(rows)}
queries, {n_oracle} with DuckDB SQL oracles (every query;
invariant-style oracles — sketch bounds, codec-decode gates — are still
full SQL comparisons of the projected columns). The first 50 rows are
the current driver window
(`kafka_streams_common_spark/queries/__init__.py`); README
§Verification holds the round-by-round rotation ledger.

## Driver window (slots 1-50)

{table(window)}

## Past-window (slots 51-{len(rows)})

{table(rest, offset=50)}
"""
    with open("docs/query_catalog.md", "w", encoding="utf-8") as fh:
        fh.write(body)
    print(f"wrote docs/query_catalog.md, {len(rows)} rows")


if __name__ == "__main__":
    main()
