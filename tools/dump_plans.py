"""Dump .explain("formatted") for declared __spark_entry__ queries.

Usage: python tools/dump_plans.py <out_dir> <suffix> [name ...]
Writes <out_dir>/<name>_<suffix>.txt for each requested query (default: a
curated set of the optimization round's touched queries).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT = [
    "lm_topk",
    "batch_search",
    "bm25_topk",
    "index_bm25_df",
    "phrase_match",
    "search_facets",
    "filtered_search",
    "total_hits",
    "more_like_this",
]


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    out_dir.mkdir(parents=True, exist_ok=True)

    import io
    import os
    from contextlib import redirect_stdout

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    import __spark_entry__ as entry
    from search_engine_spark.session import get_spark

    spark = get_spark("dump-plans", cores=8, shuffle_partitions=8)
    qs = entry.queries()
    for name in names:
        if name not in qs:
            print(f"skip {name}: not declared", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
