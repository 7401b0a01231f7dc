"""Property tests for the round-2 text/curation operators: chunking must
cover every token exactly, PII masking must be idempotent and
reference-equal, contamination fractions must be consistent, and the
leakage-safe split must never separate a dup cluster."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elevate_data_pipeline_spark.functions import pii
from elevate_data_pipeline_spark.functions.text import dup_ngram_frac
from elevate_data_pipeline_spark.operators import decontam

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=4)
TEXT = st.lists(WORD, min_size=1, max_size=40).map(" ".join)

C, S = 32, 24  # chunk size / stride used by text_chunking


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(TEXT, min_size=1, max_size=8))
def test_chunking_covers_all_tokens(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    ws = "split(text, ' ')"
    n = f"(1 + (greatest(size({ws}) - {C}, 0) + {S - 1}) div {S})"
    chunks_expr = (
        f"transform(sequence(0, {n} - 1), "
        f"i -> concat_ws(' ', slice({ws}, i*{S}+1, {C})))"
    )
    rows = df.select(
        "doc_id", F.posexplode(F.expr(chunks_expr)).alias("idx", "chunk")
    ).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.idx] = r.chunk
    for doc_id, text in enumerate(texts):
        words = text.split(" ")
        got = by_doc[doc_id]
        # chunk i must be exactly words[i*S : i*S+C]; union covers all words
        for i, chunk in got.items():
            assert chunk.split(" ") == words[i * S : i * S + C]
        covered = set()
        for i in got:
            covered.update(range(i * S, min(i * S + C, len(words))))
        assert covered == set(range(len(words)))


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            alphabet="abc @.-0123456789xyz",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_pii_mask_idempotent_and_matches_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    out = {
        r.id: (r.m1, r.m2)
        for r in df.select(
            "id",
            pii.mask_pii("t").alias("m1"),
        )
        .withColumn("t", F.col("m1"))
        .withColumn("m2", pii.mask_pii("t"))
        .collect()
    }
    for i, t in enumerate(texts):
        expect = t
        for pat, tok in ((pii.EMAIL_RE, pii.EMAIL_TOKEN),
                         (pii.PHONE_RE, pii.PHONE_TOKEN),
                         (pii.IPV4_RE, pii.IP_TOKEN)):
            expect = re.sub(pat, tok, expect)
        m1, m2 = out[i]
        assert m1 == expect          # Java regex == Python re for these patterns
        assert m2 == m1              # masking is idempotent


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(TEXT, min_size=1, max_size=6),
    bench=st.lists(TEXT, min_size=1, max_size=4),
)
def test_contamination_bounds_and_self(spark, docs, bench):
    ddf = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    got = decontam.ngram_contamination(ddf, bdf, n=3).collect()
    for r in got:
        assert 0 <= r.n_contaminated <= r.n_grams
        assert 0.0 <= r.contamination_frac <= 1.0
    # a corpus checked against itself is fully contaminated
    self_got = decontam.ngram_contamination(ddf, ddf, n=3).collect()
    for r in self_got:
        assert r.contamination_frac == 1.0


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(TEXT, min_size=1, max_size=10))
def test_dup_ngram_frac_bounds(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "id long, t string")
    for r in df.select(dup_ngram_frac("t", 2).alias("f")).collect():
        assert 0.0 <= r.f < 1.0


def test_safe_split_never_splits_a_cluster(spark):
    from elevate_data_pipeline_spark.queries import QUERIES

    from conftest import SF_DIR

    rows = QUERIES["dedup_safe_split"](spark, SF_DIR).collect()
    by_component: dict[int, set[str]] = {}
    for r in rows:
        by_component.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_component.values())
    splits = {r.split for r in rows}
    assert splits <= {"train", "val"}
    train_frac = sum(r.split == "train" for r in rows) / len(rows)
    assert 0.8 < train_frac <= 1.0


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(TEXT, min_size=1, max_size=6))
def test_block_dedup_identity_when_threshold_unreachable(spark, texts):
    """With min_docs > corpus size no block can be boilerplate, so every
    document reconstructs to its original text (blocks rejoin in order)."""
    from elevate_data_pipeline_spark.operators.dedup import block_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = block_dedup(df, block_words=3, min_docs=len(texts) + 1).collect()
    got = {r.doc_id: (r.cleaned_text, r.n_removed) for r in out}
    for i, t in enumerate(texts):
        assert got[i] == (t, 0)


@pytest.mark.slow
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=TEXT)
def test_block_dedup_strips_shared_blocks_between_copies(spark, text):
    """Two identical documents: every block of each is shared, so both
    clean to empty and n_removed == n_blocks."""
    from elevate_data_pipeline_spark.operators.dedup import block_dedup

    df = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    for r in block_dedup(df, block_words=3, min_docs=2).collect():
        assert r.cleaned_text == "" and r.n_removed == r.n_blocks > 0


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.integers(min_value=1, max_value=10_000),
                     min_size=1, max_size=60),
    n_ticks=st.integers(min_value=1, max_value=50),
)
def test_systematic_sample_partitions_ticks(spark, weights, n_ticks):
    """For ANY positive integer weights and tick count: crossings
    partition the N thresholds exactly (sum(ticks) == N), every selected
    row crosses at least one, and no row's tick range overlaps another's
    — the invariants that make the sampler a valid without-replacement
    size-proportional draw."""
    from elevate_data_pipeline_spark.operators import curation
    from elevate_data_pipeline_spark.operators.rank import global_cumsum

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n_chars long"
    )
    d = df.withColumn("_h", curation._hash32("doc_id"))
    c = global_cumsum(d, ["_h", "doc_id"], "n_chars", out_col="_cum")
    tot = sum(weights)
    hi = F.expr(f"(_cum * {n_ticks}) div {tot}")
    lo = F.expr(f"((_cum - n_chars) * {n_ticks}) div {tot}")
    rows = (
        c.filter(hi > lo)
        .select("doc_id", lo.alias("first_tick"), (hi - lo).alias("ticks"))
        .collect()
    )
    assert sum(r.ticks for r in rows) == n_ticks
    assert all(r.ticks >= 1 for r in rows)
    ranges = sorted((r.first_tick, r.first_tick + r.ticks) for r in rows)
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 <= b0  # tick ranges are disjoint
    assert ranges[0][0] >= 0 and ranges[-1][1] == n_ticks


def test_wordpiece_munch_greedy_invariants():
    """Maximal munch: always segments (alphabet coverage), token count
    bounded by [ceil(len/max_tok), len], and the first token is the
    LONGEST vocab prefix — plus exact counts on a worked example."""
    from elevate_data_pipeline_spark.operators.tokenizer import _wp_munch

    vocab = {"a", "b", "c", "ab", "abc", "bc"}
    # greedy takes "abc" (not "ab"+"c"): 1 token; then greedy again
    assert _wp_munch("abc", vocab, 3) == 1
    assert _wp_munch("abcabc", vocab, 3) == 2
    # "abab": "ab" + "ab" = 2 (greedy never needs backtracking here)
    assert _wp_munch("abab", vocab, 3) == 2
    # greedy can be suboptimal vs DP — that IS WordPiece's defined
    # behavior: "abcc" -> "abc"+"c" = 2, same as optimal
    assert _wp_munch("abcc", vocab, 3) == 2
    import itertools
    import math

    for n in (1, 2, 5, 8):
        for word in itertools.islice(
            ("".join(t) for t in itertools.product("abc", repeat=n)), 40
        ):
            k = _wp_munch(word, vocab, 3)
            assert math.ceil(n / 3) <= k <= n
