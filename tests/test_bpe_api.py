"""BPE tokenizer engine API (`ext/text.py`, r5): greedy training over
the weighted vocabulary and merge application via delimited string
replace. The suite's driver-graded `ext_bpe_encode` row runs THROUGH
this API, so its oracle evidence covers the library; here we pin the
algorithmic properties on hand-built corpora where the right answer
is checkable by eye."""

from __future__ import annotations

from marketing_etl_analytics_spark.ext.text import (
    bpe_apply_merge,
    bpe_token_counts,
    bpe_train,
    bpe_vocab,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_greedy_merge_order_and_leftmost_nonoverlap(spark):
    """'aaab aaab ab' : round 1 must merge the most frequent pair
    (a,a) — and apply it leftmost-non-overlapping, so 'aaab' becomes
    [aa, a, b], NOT [a, aa, b] or an overlapped [aa, aa?]."""
    docs = _docs(spark, ["aaab aaab ab"])
    merges, vocab = bpe_train(docs, n_merges=1)
    assert merges[0] == ("a", "a")
    rows = {r["w"]: r["s"] for r in vocab.collect()}
    sep = "\x1f"
    assert rows["aaab"] == f"{sep}aa{sep}{sep}a{sep}{sep}b{sep}"
    assert rows["ab"] == f"{sep}a{sep}{sep}b{sep}"  # untouched


def test_merged_symbol_participates_in_later_rounds(spark):
    """After (a,a)->aa, round 2 on 'aaab' counts pairs over [aa,a,b];
    frequency-weighted training then merges the winning pair of the
    NEW symbol alphabet — the property that makes BPE hierarchical."""
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges, vocab = bpe_train(docs, n_merges=2)
    assert merges == [("a", "a"), ("aa", "aa")]
    rows = {r["w"]: r["s"] for r in vocab.collect()}
    sep = "\x1f"
    assert rows["aaaa"] == f"{sep}aaaa{sep}"  # fully merged: 1 token


def test_token_counts_roll_up_through_vocab(spark):
    docs = _docs(spark, ["ab ab cd", "ab"])
    merges, vocab = bpe_train(docs, n_merges=1)
    assert merges[0] == ("a", "b")  # freq 3 beats (c,d) freq 1
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_token_counts(docs, vocab).collect()
    }
    # doc 0: 'ab'(1 tok) x2 + 'cd'(2 toks) = 4; doc 1: 'ab' = 1
    assert out == {0: (3, 4), 1: (1, 1)}


def test_train_exhausts_gracefully(spark):
    """More rounds than mergeable pairs: training stops when the
    vocabulary is fully merged instead of erroring on an empty agg."""
    docs = _docs(spark, ["ab ab"])
    merges, vocab = bpe_train(docs, n_merges=5)
    assert merges == [("a", "b")]
    assert bpe_vocab(docs).count() == vocab.count() == 1


def test_apply_merge_is_idempotent_on_nonmatching(spark):
    docs = _docs(spark, ["xy"])
    v = bpe_vocab(docs)
    v2 = bpe_apply_merge(v, "q", "z")
    assert v.collect() == v2.collect()


def test_bpe_fixed_table_apply_semantics(spark):
    """The imported 64-merge table applies with leftmost
    non-overlapping greedy-fold semantics: fully-chained words
    collapse to one token, partial overlaps merge only their
    matching prefix pairs, untouched words stay char-split."""
    from marketing_etl_analytics_spark.ext.text import (
        BPE_FIXED_MERGES,
        bpe_apply_table,
        bpe_token_counts,
        bpe_vocab,
    )

    assert len(BPE_FIXED_MERGES) == 64
    docs = spark.createDataFrame(
        [(0, "the table window"), (1, "data fast xyz")],
        "doc_id long, text string",
    )
    applied = bpe_apply_table(bpe_vocab(docs))
    out = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
        for r in bpe_token_counts(docs, applied).collect()
    }
    # the/table/window each collapse to exactly 1 token
    assert out[0] == (3, 14, 3)
    # data -> d,a,ta (the (t,a) merge fires mid-word) = 3 tokens;
    # fast -> f,a,st ((s,t) fires) = 3; xyz has no merges = 3
    assert out[1] == (3, 11, 9)
