"""A2 numbers fixture (FIXTURES.md §A2): the reference's main unit test —
sequential integers split across files, run through an identity map/reduce,
output must equal the lexicographically sorted input with exact row count
(test_test.go:46-86, makeInputs at :99-117). Here: text scan → tokenize
(identity: one token per line) → global lexicographic sort, compared
against an in-process golden sort — including the string-sort subtlety
("10" < "2") the reference's check() relies on."""

from __future__ import annotations

import pytest

from url_counter_mapreduce_spark.sources.text import read_url_text, tokenize_urls

N_NUMBERS = 100000  # §A2 / test_test.go:16: nNumber = 100000
N_FILES = 7  # deliberately not a divisor — chunking must not drop the tail


@pytest.fixture(scope="module")
def numbers_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("numbers")
    nums = [str(n) for n in range(N_NUMBERS)]
    per_file = -(-N_NUMBERS // N_FILES)  # ceil: every number lands in a file
    for i in range(N_FILES):
        chunk = nums[i * per_file : (i + 1) * per_file]
        if chunk:
            (root / f"n{i}.txt").write_text("\n".join(chunk) + "\n")
    return str(root)


def test_identity_sort_matches_golden(spark, numbers_fixture):
    out = [
        r.url
        for r in tokenize_urls(read_url_text(spark, numbers_fixture)).orderBy("url").collect()
    ]
    golden = sorted(str(n) for n in range(N_NUMBERS))  # lexicographic, as strings
    assert len(out) == N_NUMBERS  # exact row count, as check() asserts
    assert out == golden
    # the sort is genuinely lexicographic: "10..." sorts before "2"
    assert out[0] == "0" and out.index("10") < out.index("2")
