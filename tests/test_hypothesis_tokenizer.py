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


def _gopher_reference(text: str):
    """Direct Python implementation of quality_gopher's n-gram metrics."""
    toks = [t for t in text.split(" ") if t != ""]
    n_chars = len(text)
    out = {"top2": 0.0, "dup3": 0.0}
    if len(toks) >= 2 and n_chars:
        bigrams = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
        # tie-break: highest count, then lexicographically smallest gram
        best = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out["top2"] = int(best[1] * len(best[0]) / n_chars * 1e6 + 0.5) / 1e6
    if len(toks) >= 3 and n_chars:
        trigrams = Counter(" ".join(toks[i : i + 3]) for i in range(len(toks) - 2))
        dup_chars = sum((c - 1) * len(g) for g, c in trigrams.items())
        out["dup3"] = int(dup_chars / n_chars * 1e6 + 0.5) / 1e6
    return out


token = st.text(alphabet="abcdexyz", min_size=1, max_size=4)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(token, min_size=0, max_size=12), min_size=1, max_size=4))
def test_gopher_ngram_metrics_match_python_reference(spark, docs_tokens):
    """quality_gopher's repetition fractions must equal a direct Python
    implementation on arbitrary small token corpora (small alphabet so
    duplicate n-grams actually occur)."""
    from pytest import approx

    from url_counter_mapreduce_spark.operators import text as text_ops

    rows = []
    for i, toks in enumerate(docs_tokens):
        t = " ".join(toks)
        rows.append((i, t, "en", "s0", len(t)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import unittest.mock as mock

    with mock.patch(
        "url_counter_mapreduce_spark.operators.text.load_table",
        lambda _s, _d, _n: docs,
    ):
        got = {r["doc_id"]: r.asDict() for r in text_ops.quality_gopher(spark, "x").collect()}
    for i, toks in enumerate(docs_tokens):
        ref = _gopher_reference(" ".join(toks))
        assert got[i]["top_bigram_char_frac"] == approx(ref["top2"], abs=2e-6), (i, toks)
        assert got[i]["dup_trigram_char_frac"] == approx(ref["dup3"], abs=2e-6), (i, toks)


# text with the symbols the Gopher battery treats specially ('#', '...'),
# spaces, and unicode letters — the input space where the three Gopher
# formulations could disagree (rounding, argmax tie-breaks, NULL guards)
# a small alphabet makes repeated n-grams, '...'-runs, and '#' density
# actually occur within 50 chars; 'é' keeps a non-ASCII letter in play
gopher_text = st.text(alphabet="ab .#é", max_size=50)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(gopher_text, min_size=1, max_size=6))
def test_gopher_three_formulations_agree_on_random_text(spark, texts):
    """The round-11 Arrow kernel (gopher_metrics_arrow) must agree with the
    array-expression formulation on ARBITRARY text — including '#'/'...'
    runs, repeated tokens (small alphabet), unicode letters, empty and
    whitespace-only strings — across every metric and the keep flag. The
    fixture-based equivalence test pins the corpus; this pins the input
    space."""
    from url_counter_mapreduce_spark.operators.text import (
        gopher_maponly_metrics,
        gopher_metrics_arrow,
    )

    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cols = [
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "symbol_word_ratio",
        "top_bigram_char_frac",
        "dup_trigram_char_frac",
        "keep",
    ]
    mo = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in gopher_maponly_metrics(docs).select("doc_id", *cols).collect()
    }
    ar = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in gopher_metrics_arrow(docs).select("doc_id", *cols).collect()
    }
    assert mo == ar, texts
