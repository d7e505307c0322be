"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`azure_batch_map_reduce_spark.registry` — every engine
operator registers itself there with a PySpark builder and (when
SQL-expressible) a DuckDB oracle; this module just exposes the registry in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from azure_batch_map_reduce_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# Families already driver-verified in round 1 (CORRECTNESS_r01: the etl /
# graph / core-relational block) move to the back; the LLM-pipeline
# (dedup / ANN / retrieval / curation), streaming, and this round's
# rewritten scale-shape queries lead, so sampled verification reaches the
# operators with the least driver coverage first.
_VERIFY_FIRST = [
    # exact + near-dup dedup family
    "q60_exact_dedup", "q61_normalized_dedup", "q62_minhash_lsh_neardup",
    "q63_simhash", "q64_ngram_jaccard_topk", "q65_embedding_neardup",
    "q66_neardup_clusters", "q67_ml_minhash_lsh", "q68_simhash_hamming_pairs",
    "q100_incremental_neardup", "q111_fuzzy_blocked_join",
    "q150_prefix_filter_simjoin", "q181_golden_record",
    "q228_dedup_threshold_sweep",
    # similarity / ANN family
    "q70_cosine_topk", "q71_lsh_bucketed_ann", "q72_label_centroid_similarity",
    "q73_ivf_ann", "q79_retrieval_join", "q163_power_iteration_pca",
    "q169_knn_classify", "q183_label_embedding_pool",
    "q186_embedding_dim_variance", "q190_hybrid_rrf_retrieval",
    # round-2 NEW LLM-pipeline operators (never driver-sampled)
    "q239_bpe_merge_training", "q240_temperature_mixing",
    "q241_hard_negative_mining", "q242_pq_ann",
    "q243_kmeans_lloyd_step", "q244_group_kfold_split",
    "q245_matryoshka_fidelity", "q246_bpe_compression_rate",
    "q247_seasonal_decompose", "q248_vocab_kl_drift",
    "q249_exact_quantiles_distributed", "q250_dedup_cluster_profile",
    "q251_markov_transitions", "q252_length_bucket_batching",
    "q253_stream_dominant_type", "q254_portable_count_min",
    "q255_distributed_auc",
    # round-2 rewritten scale shapes + the new rank primitive
    "q139_ks_two_sample", "q167_mutual_information", "q171_lift_curve",
    "q235_rfm_segmentation", "q236_distributed_rank",
    # streaming (all real availableNow streams; q84/q86 = stateful)
    "q80_tumbling_window", "q82_session_window",
    "q85_watermark_late_drop", "q87_stream_stream_join",
    "q142_stream_static_enrich", "q172_stream_windowed_distinct",
    "q192_lateness_profile", "q198_debounce_events",
    "q84_stateful_sessionize", "q86_transform_with_state",
    "q122_streaming_upsert",
    # retrieval + curation north stars
    "q107_bm25_retrieval", "q129_curation_funnel",
    # remaining streaming + text-analysis core
    "q81_sliding_window", "q83_dedup_events",
    "q50_token_stats", "q51_quality_score", "q52_langid", "q53_fingerprint",
    "q54_pii_scrub", "q158_heavy_hitters",
]


def _ordered():
    reg = load_all()
    out = {n: reg[n] for n in _VERIFY_FIRST if n in reg}
    out.update((n, q) for n, q in reg.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only checks omit their entry."""
    return {
        name: q.oracle for name, q in _ordered().items() if q.oracle is not None
    }
