#!/usr/bin/env python
"""Regenerate fixtures/compression_expected.parquet — the committed side
table that gives quality_compression_ratio an exact DuckDB oracle.

DEFLATE has no SQL form, but the fixture corpora are deterministic and
zlib level-6 output is a pure function of the input bytes — so the
expected compressed length per DISTINCT text can be precomputed once at
fixture-build time and joined by text hash at oracle time (VERDICT r07
item 4b). Rows are keyed by md5 of the UTF-8 text (nulls as ''), deduped,
and sorted so the parquet bytes are reproducible; a regen-diff test
guards staleness the same way the docs tables are guarded.
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = os.path.join(REPO, "fixtures", "compression_expected.parquet")


def build_rows() -> list[tuple[str, int, int]]:
    seen: dict[str, tuple[int, int]] = {}
    for sf in SF_DIRS:
        path = os.path.join(sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        tbl = pq.read_table(path, columns=["text"])
        for chunk in tbl.column("text").chunks:
            for v in chunk:
                text = v.as_py() or ""
                data = text.encode("utf-8")
                key = hashlib.md5(data).hexdigest()
                if key not in seen:
                    seen[key] = (len(data), len(zlib.compress(data, 6)))
    return sorted((k, nb, nc) for k, (nb, nc) in seen.items())


def write(rows: list[tuple[str, int, int]], out: str = OUT) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    table = pa.table(
        {
            "text_md5": pa.array([r[0] for r in rows], pa.string()),
            "n_bytes": pa.array([r[1] for r in rows], pa.int64()),
            "n_compressed": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, out, compression="zstd", version="2.6")


if __name__ == "__main__":
    rows = build_rows()
    write(rows)
    print(f"{OUT}: {len(rows)} distinct texts", file=sys.stderr)
