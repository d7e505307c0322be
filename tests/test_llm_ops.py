"""Invariant tests for the round-2 LLM-pipeline operators: BPE merge
conservation, temperature-mixing algebra, hard-negative label
constraint, and PQ distance sanity. These run on sf0.001 fixtures via
the registry (the oracle differential already pins exact values; these
pin the *semantics* the oracles can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_batch_map_reduce_spark.registry import load_all

REGISTRY = load_all()


def test_bpe_merges_are_distinct_and_monotone_counts(spark, sf_dir):
    rows = (
        REGISTRY["q239_bpe_merge_training"].fn(spark, sf_dir).orderBy("iter").collect()
    )
    assert [r.iter for r in rows] == [1, 2, 3]
    merges = [(r.lhs, r.rhs) for r in rows]
    assert len(set(merges)) == 3  # a pair can win at most once
    for r in rows:
        assert r.merged == r.lhs + r.rhs
        assert r.pair_count > 0
    # Greedy BPE adopts pairs in non-increasing frequency order UNLESS a
    # later merge creates a new heavy pair; with 3 rounds over natural
    # word soup the first merge must dominate the second.
    assert rows[0].pair_count >= rows[1].pair_count


def test_temperature_mixing_shares_and_boost(spark, sf_dir):
    rows = REGISTRY["q240_temperature_mixing"].fn(spark, sf_dir).collect()
    raw = sum(r.raw_share for r in rows)
    temp = sum(r.temp_share for r in rows)
    assert abs(raw - 1.0) < 1e-4 and abs(temp - 1.0) < 1e-4
    # Temperature flattening: sources above mean size are downsampled
    # (boost < 1), below-mean sources upsampled (boost > 1).
    mean_n = sum(r.n_docs for r in rows) / len(rows)
    for r in rows:
        if r.n_docs > mean_n * 1.2:
            assert r.sample_boost < 1.0
        if r.n_docs < mean_n * 0.8:
            assert r.sample_boost > 1.0


def test_hard_negatives_have_different_labels(spark, sf_dir):
    df = REGISTRY["q241_hard_negative_mining"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 40
    for r in rows:
        assert r.label != r.neg_label
        assert -1.0 <= r.cosine <= 1.0
    # One row per anchor.
    assert len({r.vec_id for r in rows}) == len(rows)


def test_pq_adc_nonnegative_and_sorted(spark, sf_dir):
    rows = REGISTRY["q242_pq_ann"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r.adc_dist >= 0.0 for r in rows)
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)
    assert 0 not in {r.vec_id for r in rows}  # query excluded


def test_pq_agrees_with_exact_knn_on_recall(spark, sf_dir):
    """PQ is approximate, and the fixture vectors are near-random (the
    exact top-1 cosine is only ~0.33), so 8-bit codes recover little of
    the true neighborhood — but a broken codebook or a sign error in
    the ADC kills the overlap entirely. Floor: at least one of the
    exact cosine top-10 (q70) must survive into the ADC top-10."""
    pq = {r.vec_id for r in REGISTRY["q242_pq_ann"].fn(spark, sf_dir).collect()}
    exact = {r.vec_id for r in REGISTRY["q70_cosine_topk"].fn(spark, sf_dir).collect()}
    assert len(pq & exact) >= 1


def test_bpe_merge_fold_exact_greedy(spark):
    """Pin bpe_merge_symbols against the two literal-replace failure
    shapes (round-2 ADVICE item): (1) a needle must never match a
    longer merged symbol that merely STARTS with rhs ('|s|th' with
    merge (s,t) stays intact); (2) symbol-ADJACENT occurrences must
    both merge ('aththb' with (t,h) → a,th,th,b — the trailing-sentinel
    replace would miss the second); plus the same-symbol run
    alternation greedy BPE requires."""
    from azure_batch_map_reduce_spark.functions.text import bpe_merge_symbols

    cases = [
        ("|s|th", "s", "t", "|s|th"),          # prefix-of-merged-symbol
        ("|a|th|t|h|b", "t", "h", "|a|th|th|b"),  # adjacent occurrences
        ("|a|a|a", "a", "a", "|aa|a"),
        ("|a|a|a|a", "a", "a", "|aa|aa"),
        ("|a|a|a|a|a", "a", "a", "|aa|aa|a"),
        ("|x|a|b|y", "a", "b", "|x|ab|y"),
        ("|a", "a", "a", "|a"),
        ("|ab|a|b", "a", "b", "|ab|ab"),       # earlier merged symbol inert
    ]
    df = spark.createDataFrame(
        [(s, l, r) for s, l, r, _ in cases], "s string, l string, r string"
    )
    got = [
        r.m
        for r in df.select(
            bpe_merge_symbols(F.col("s"), F.col("l"), F.col("r")).alias("m")
        ).collect()
    ]
    assert got == [want for _, _, _, want in cases]

    # And the DuckDB oracle form is the same fold, case by case.
    import duckdb

    con = duckdb.connect()
    for s, l, r, want in cases:
        v = con.execute(
            """
            SELECT list_reduce(
                list_prepend('', list_filter(string_split(?, '|'),
                                             x -> x <> '')),
                (acc, x) -> CASE WHEN x = ? AND ends_with(acc, '|' || ?)
                            THEN acc || x ELSE acc || '|' || x END)
            """,
            [s, r, l],
        ).fetchone()[0]
        assert v == want, (s, l, r, v, want)
