"""Build a scaled-up copy of a testdata scale factor by key-shifted
replication — the input for the BENCH_SF1 scaling run (VERDICT r9
order #5: measure per-query scaling exponents at 10x the bench data).

Method: N copies of every fact table with all surrogate keys offset by
copy*STRIDE so foreign keys stay consistent within a copy and copies
never collide.  `region`/`nation` are fixed dimensions (as in TPC-H,
dimension cardinality does not grow with SF).  Timestamps, prices, and
categorical columns are left untouched so per-key distributions — and
therefore join/agg selectivities — match the source SF exactly.

Documents: copies k>0 get every 11th word deterministically rewritten
(reversed + copy digit).  With k=5 shingles this breaks ~45% of each
cross-copy shingle pair's overlap (Jaccard ~0.4, below the 0.8 verify
threshold), so near-dup structure stays LINEAR in N: each copy carries
the same in-copy near-dup pairs as the source, and replication does not
manufacture quadratic cross-copy duplicate clusters that would make the
dedup pipeline's scaling exponent lie.  Exact-dup rate within a copy is
unchanged.  n_chars is recomputed from the rewritten text.

Embeddings: vec_id offsets only; vectors/labels unchanged (identical
vectors across copies tie in top-k — fine for timing, and IVF/LSH cell
sizes grow linearly as they would at real scale).

Usage: python tools/make_sfN.py <src_dir> <dst_dir> <n_copies>
e.g.   python tools/make_sfN.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000

FACTS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def rewrite_text(text: str, k: int) -> str:
    if k == 0:
        return text
    words = text.split(" ")
    for i in range(10, len(words), 11):
        words[i] = words[i][::-1] + str(k)
    return " ".join(words)


def main():
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.create_function("rewrite_text", rewrite_text)

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: dimension copied")

    for t, keys in FACTS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        arms = []
        for k in range(n):
            sel = ", ".join(
                f"({c} + {k * STRIDE}) AS {c}" if c in keys else c for c in cols
            )
            arms.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(arms)}) TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        rows = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {rows} rows")

    # documents: per-copy text rewrite + recomputed n_chars
    arms = []
    for k in range(n):
        arms.append(
            f"SELECT (doc_id + {k * STRIDE}) AS doc_id,"
            f" rewrite_text(text, {k}) AS text, lang, source,"
            f" length(rewrite_text(text, {k})) AS n_chars"
            f" FROM '{src}/documents.parquet'"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(arms)}) TO '{dst}/documents.parquet' (FORMAT parquet)"
    )
    rows = con.execute(
        f"SELECT count(*) FROM '{dst}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {rows} rows")


if __name__ == "__main__":
    main()
