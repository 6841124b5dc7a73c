"""Regenerate ``queries_manifest.json`` from the live registry.

The manifest is the machine-readable declaration of the FULL query
inventory (name + whether a DuckDB oracle is provided) for any
harness that wants to enumerate the correctness surface without
importing this package: rounds 1–2 the driver's CORRECTNESS gate
checked a fixed 50-name subset while ``queries()`` had grown to 113 —
this file, plus `__spark_entry__.queries()` itself, is the inventory
to consume.

Usage: python tools/gen_manifest.py   (writes repo-root manifest)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflowex_spark import queries as _q  # noqa: E402


def manifest() -> dict:
    # REGISTRY declaration order, NOT the driver-facing rotated order:
    # rotation depends on which CORRECTNESS_r*.json artifacts exist at
    # import time, so a manifest generated in rotated order goes stale
    # the moment the driver writes a new artifact (round-4 lesson).
    # Declaration order is stable across rounds; consumers that need
    # the live window order call __spark_entry__.queries() directly.
    names = list(_q.REGISTRY)
    oracled = {n for n, (_fn, sql) in _q.REGISTRY.items() if sql is not None}
    return {
        "total": len(names),
        "oracled": len(oracled),
        "rows_only": len(names) - len(oracled),
        "queries": [
            {"name": n, "oracle": n in oracled} for n in names
        ],
    }


if __name__ == "__main__":
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "queries_manifest.json",
    )
    with open(out, "w") as f:
        json.dump(manifest(), f, indent=1)
        f.write("\n")
    m = manifest()
    print(f"wrote {out}: {m['total']} queries ({m['oracled']} oracled)")
