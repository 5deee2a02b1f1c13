"""Property-based check (SURVEY.md §5, 'property-based additions'): the
engine's tokenizer must agree with a direct Python implementation of the
reference's semantics — split on the single space character, drop empty
tokens (strings.FieldsFunc(contents, r==' '), main.go:24-26) — on arbitrary
inputs including runs of spaces, leading/trailing spaces, and unicode."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from url_counter_mapreduce_spark.sources.text import tokenize_urls

# printable-ish text with lots of spaces; newlines excluded (the text source
# is line-oriented; newline handling is covered in test_text_source)
line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), blacklist_characters="\n\r"),
    max_size=60,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(line, min_size=0, max_size=8))
def test_tokenizer_matches_reference_semantics(spark, lines):
    golden = Counter(t for ln in lines for t in ln.split(" ") if t != "")
    df = spark.createDataFrame([(ln,) for ln in lines] or [("",)], "value string")
    if not lines:
        golden = Counter()
    got = Counter(r.url for r in tokenize_urls(df).collect())
    assert got == golden
