"""Stored banded-signature index (operators/index_store.py): the probe must
equal the session-cache incremental path, survive a FRESH session (the
nightly-crawl shape: build tonight, probe tomorrow), and re-key when the
corpus bytes change."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

from pyspark.sql import functions as F

from tests.conftest import REPO_ROOT, SF_SMOKE
from url_counter_mapreduce_spark.operators import dedup, index_store


def _sorted_rows(df):
    return sorted(str(tuple(r)) for r in df.collect())


def test_build_then_probe_matches_session_incremental(spark):
    """Stored-artifact probe ≡ session-cache incremental_minhash_pairs —
    candidate generation is identical (a new-old pair shares a band in the
    full self-join iff it shares one in the probe join), so the outputs
    must be row-identical, not just count-identical."""
    index_store.drop_index(SF_SMOKE)
    summary = index_store.minhash_index_build(spark, SF_SMOKE).collect()
    assert {r["band"] for r in summary} == {0, 1, 2, 3}
    assert all(r["n_postings"] >= r["n_keys"] > 0 for r in summary)
    got = _sorted_rows(index_store.minhash_index_probe(spark, SF_SMOKE))
    want = _sorted_rows(dedup.incremental_minhash_pairs(spark, SF_SMOKE))
    assert got == want and len(got) > 0


def test_probe_bootstraps_missing_index(spark):
    """First probe on a corpus with no stored artifact builds it once
    (idempotent bootstrap), then serves from disk."""
    index_store.drop_index(SF_SMOKE)
    assert not index_store.index_exists(SF_SMOKE)
    n = index_store.minhash_index_probe(spark, SF_SMOKE).count()
    assert index_store.index_exists(SF_SMOKE)
    assert n > 0


_FRESH_CHILD = r"""
import json, sys
sf_dir = sys.argv[1]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("index-probe-fresh")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "3g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from url_counter_mapreduce_spark.operators import index_store
rows = index_store.minhash_index_probe(spark, sf_dir).collect()
spark.stop()
print("RESULT:" + json.dumps(sorted(str(tuple(r)) for r in rows)))
"""


def test_probe_in_fresh_session_reads_stored_artifact(spark):
    """The VERDICT r11 item-2 contract: build in THIS session, probe in a
    brand-new SparkSession (subprocess — in-process fixtures can't detach
    from the session cache), and require (a) identical output and (b) no
    rebuild — the child must read the artifact this session stored."""
    index_store.drop_index(SF_SMOKE)
    index_store.minhash_index_build(spark, SF_SMOKE)
    meta = index_store._meta_path(index_store.index_dir(SF_SMOKE))
    mtime_before = os.stat(meta).st_mtime_ns
    want = _sorted_rows(dedup.incremental_minhash_pairs(spark, SF_SMOKE))

    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    proc = subprocess.run(
        [sys.executable, "-c", _FRESH_CHILD, SF_SMOKE],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env=env,
        timeout=540,
    )
    assert proc.returncode == 0, f"fresh-session probe failed:\n{proc.stderr[-3000:]}"
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    got = json.loads(line[len("RESULT:"):])
    assert got == want
    assert os.stat(meta).st_mtime_ns == mtime_before, "fresh session rebuilt the index"


def test_index_dir_rekeys_on_corpus_change(tmp_path):
    """The artifact path is keyed to the documents file's content
    fingerprint: regenerated fixture bytes at the same sf_dir must map to
    a DIFFERENT index location (stale-read protection, same discipline as
    the streaming state-audit checkpoint)."""
    sf_copy = tmp_path / "sfX"
    sf_copy.mkdir()
    src = os.path.join(SF_SMOKE, "documents.parquet")
    dst = sf_copy / "documents.parquet"
    shutil.copyfile(src, dst)
    before = index_store.index_dir(str(sf_copy))
    os.utime(dst, ns=(os.stat(dst).st_mtime_ns + 7, os.stat(dst).st_mtime_ns + 7))
    after = index_store.index_dir(str(sf_copy))
    assert before != after


def test_snapshot_is_new_column_convention(spark):
    """snapshot_is_new: data column wins when named (boolean true or the
    literal 'new'); the fixture falls back to doc_id % 3 == 0."""
    df = spark.createDataFrame(
        [(0, "new"), (1, "new"), (2, "old"), (3, "old")], ["doc_id", "snap"]
    )
    by_col = [r["doc_id"] for r in df.filter(dedup.snapshot_is_new("snap")).collect()]
    assert sorted(by_col) == [0, 1]
    booldf = spark.createDataFrame([(0, True), (1, False)], ["doc_id", "snap"])
    assert [r["doc_id"] for r in booldf.filter(dedup.snapshot_is_new("snap")).collect()] == [0]
    by_fixture = [r["doc_id"] for r in df.filter(dedup.snapshot_is_new()).collect()]
    assert sorted(by_fixture) == [0, 3]


def test_snapshot_is_new_null_and_case(spark):
    """ADVICE r12: NULL snapshot values must land in exactly ONE side (the
    previous snapshot — conservative for dedup), never vanish from both;
    and matching is case-insensitive ('NEW'/'True' count as new)."""
    df = spark.createDataFrame(
        [(0, "NEW"), (1, "True"), (2, None), (3, "old")], ["doc_id", "snap"]
    )
    is_new = dedup.snapshot_is_new("snap")
    new_ids = sorted(r["doc_id"] for r in df.filter(is_new).collect())
    old_ids = sorted(r["doc_id"] for r in df.filter(~is_new).collect())
    assert new_ids == [0, 1]
    assert old_ids == [2, 3]  # NULL row present on the previous side
    assert sorted(new_ids + old_ids) == [0, 1, 2, 3]  # partition, no loss


def test_index_dir_keys_on_snapshot_col(tmp_path):
    """ADVICE r12: an index built under one snapshot convention must never
    be served to a probe using another — the path itself is keyed."""
    sf_copy = tmp_path / "sfY"
    sf_copy.mkdir()
    shutil.copyfile(
        os.path.join(SF_SMOKE, "documents.parquet"),
        sf_copy / "documents.parquet",
    )
    d_fixture = index_store.index_dir(str(sf_copy))
    d_col = index_store.index_dir(str(sf_copy), "snap")
    d_variant = index_store.index_dir(str(sf_copy), "snap", "app")
    assert len({d_fixture, d_col, d_variant}) == 3


def test_ensure_index_rebuilds_on_meta_mismatch(spark, tmp_path):
    """Belt-and-braces half of the ADVICE fix: a hand-moved artifact whose
    stored meta records a different snapshot_col is rebuilt, not misread."""
    sf_copy = tmp_path / "sfZ"
    sf_copy.mkdir()
    shutil.copyfile(
        os.path.join(SF_SMOKE, "documents.parquet"),
        sf_copy / "documents.parquet",
    )
    sf = str(sf_copy)
    index_store.minhash_index_build(spark, sf)
    root = index_store.index_dir(sf)
    meta = index_store._read_meta(root)
    meta["snapshot_col"] = "somethingelse"
    index_store._write_meta(root, meta)
    index_store._ensure_index(spark, sf, None)
    assert index_store._read_meta(root)["snapshot_col"] is None, (
        "mismatched meta must trigger a rebuild"
    )


def test_append_equals_rebuild(spark, tmp_path):
    """The append-path contract (VERDICT r12 item 5): build(A) then
    append(B) must answer a probe byte-identically to a from-scratch
    build(A ∪ B), and the append must not rewrite the index (generations
    counter advances; probe reuses the artifact as-is)."""
    from pyspark.sql import functions as SF

    sf_dir = str(tmp_path / "sfApp")
    base = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    base.withColumn(
        "snap", SF.when(SF.col("doc_id") % 3 == 0, "new").otherwise("old")
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    part_a = docs.filter(SF.col("doc_id") % 3 == 1)
    part_b = docs.filter(SF.col("doc_id") % 3 == 2)

    # oracle: one-shot index over the full previous snapshot A ∪ B
    index_store.drop_index(sf_dir, "snap")
    index_store.minhash_index_build(spark, sf_dir, "snap")
    want = _sorted_rows(index_store.minhash_index_probe(spark, sf_dir, "snap"))

    # nightly path: build A, append B, probe the same delta
    index_store.drop_index(sf_dir, "snap", variant="app")
    index_store.minhash_index_build(spark, sf_dir, "snap", variant="app", docs=part_a)
    summary = index_store.minhash_index_append(
        spark, sf_dir, part_b, "snap", variant="app"
    ).collect()
    assert {r["band"] for r in summary} == {0, 1, 2, 3}
    got = _sorted_rows(
        index_store.minhash_index_probe(spark, sf_dir, "snap", variant="app")
    )
    assert got == want and len(got) > 0
    meta = index_store._read_meta(index_store.index_dir(sf_dir, "snap", "app"))
    assert meta["generations"] == 2


def test_compact_preserves_probe_and_consolidates(spark, tmp_path):
    """minhash_index_compact: after build(A) + append(B), compaction must
    (a) leave probe output byte-identical, (b) reset generations to 1,
    and (c) reduce the bands table's data-file count back to one
    clustered write per partition — without recomputing signatures."""
    from pyspark.sql import functions as SF

    sf_dir = str(tmp_path / "sfCpt")
    base = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    base.withColumn(
        "snap", SF.when(SF.col("doc_id") % 3 == 0, "new").otherwise("old")
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    index_store.drop_index(sf_dir, "snap", variant="cpt")
    index_store.minhash_index_build(
        spark, sf_dir, "snap", variant="cpt",
        docs=docs.filter(SF.col("doc_id") % 3 == 1),
    )
    index_store.minhash_index_append(
        spark, sf_dir, docs.filter(SF.col("doc_id") % 3 == 2), "snap", "cpt"
    )
    before = _sorted_rows(
        index_store.minhash_index_probe(spark, sf_dir, "snap", variant="cpt")
    )
    root = index_store.index_dir(sf_dir, "snap", "cpt")

    def n_files(table):
        return sum(
            1
            for _dir, _sub, files in os.walk(os.path.join(root, table))
            for f in files
            if f.endswith(".parquet")
        )

    files_before = n_files("bands")
    summary = index_store.minhash_index_compact(
        spark, sf_dir, "snap", variant="cpt"
    ).collect()
    assert {r["band"] for r in summary} == {0, 1, 2, 3}
    assert index_store._read_meta(root)["generations"] == 1
    assert n_files("bands") < files_before
    after = _sorted_rows(
        index_store.minhash_index_probe(spark, sf_dir, "snap", variant="cpt")
    )
    assert after == before and len(after) > 0


def test_compact_without_index_raises(spark, tmp_path):
    sf_copy = tmp_path / "sfNoC"
    sf_copy.mkdir()
    shutil.copyfile(
        os.path.join(SF_SMOKE, "documents.parquet"),
        sf_copy / "documents.parquet",
    )
    index_store.drop_index(str(sf_copy))
    try:
        index_store.minhash_index_compact(spark, str(sf_copy))
        raise AssertionError("compact on a missing index must raise")
    except ValueError as e:
        assert "nothing to compact" in str(e)


def test_append_without_build_raises(spark, tmp_path):
    sf_copy = tmp_path / "sfNoIdx"
    sf_copy.mkdir()
    shutil.copyfile(
        os.path.join(SF_SMOKE, "documents.parquet"),
        sf_copy / "documents.parquet",
    )
    docs = index_store.load_table(spark, str(sf_copy), "documents")
    index_store.drop_index(str(sf_copy))
    try:
        index_store.minhash_index_append(spark, str(sf_copy), docs.limit(1))
        raise AssertionError("append on a missing index must raise")
    except ValueError as e:
        assert "build before appending" in str(e)
