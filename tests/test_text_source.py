"""Reference-native input format test (FIXTURES.md §A1): seeded random
3-letter-domain URL files shaped exactly like src/main/data0..7.txt, run
through the full scan→tokenize→count→top-K pipeline from raw text, checked
against an in-process golden computation — the adaptation of the
reference's check() oracle (test_test.go:46-86) plus its fixture generator
(test_test.go.bak:111-118)."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from url_counter_mapreduce_spark.sources.text import (
    read_url_text,
    tokenize_urls,
    url_topk_from_text,
)

N_FILES = 4
URLS_PER_FILE = 2000


@pytest.fixture(scope="module")
def url_fixture(tmp_path_factory):
    """Deterministic mirror of the reference's generator: uniform random
    https://{3 a-z letters}.com tokens, space-separated."""
    rng = random.Random(42)
    root = tmp_path_factory.mktemp("urls")
    golden = Counter()
    for i in range(N_FILES):
        urls = [
            "https://" + "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(3)) + ".com"
            for _ in range(URLS_PER_FILE)
        ]
        golden.update(urls)
        (root / f"data{i}.txt").write_text(" ".join(urls) + "\n")
    return str(root), golden


def test_tokenize_matches_golden_count(spark, url_fixture):
    path, golden = url_fixture
    total = tokenize_urls(read_url_text(spark, path)).count()
    assert total == sum(golden.values()) == N_FILES * URLS_PER_FILE


def test_url_counts_match_golden(spark, url_fixture):
    path, golden = url_fixture
    counts = tokenize_urls(read_url_text(spark, path)).groupBy("url").count().collect()
    engine = {r["url"]: r["count"] for r in counts}
    assert engine == dict(golden)


def test_topk_matches_golden(spark, url_fixture):
    path, golden = url_fixture
    top = url_topk_from_text(spark, path, k=100).collect()
    # golden top-100 with the same deterministic tie order (cnt desc, url asc)
    expect = sorted(golden.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert [(r.url, r.cnt) for r in top] == expect


def test_empty_tokens_dropped(spark, tmp_path):
    """The reference's strings.FieldsFunc drops empty tokens (main.go:24-26):
    double spaces and blank lines must not produce empty-string URLs."""
    p = tmp_path / "gaps.txt"
    p.write_text("a  b   c\n\n d \n")
    rows = tokenize_urls(read_url_text(spark, str(p))).collect()
    assert sorted(r.url for r in rows) == ["a", "b", "c", "d"]
