from .agg import (build_grouped_sketches, build_sketch, cms_lookup,
                  estimate_grouped, hash_col, ibf_recover, probe_membership,
                  salted_repartition)
from .collisions import (absolute_collisions, collision_sweep_k,
                         collision_sweep_m, probe_indices,
                         relative_collisions)
from .frequent import (heavy_hitters, heavy_hitters_by_group,
                       mg_lookup)
from .joins import bloom_antijoin, bloom_semijoin, estimate_join_size
from .partitioning import (assign_token_shards, boundaries_from_sketch,
                           partition_balance,
                           quantile_boundaries, repartition_balanced,
                           with_range_bucket)
from .reconcile import build_ibf_shards, ibf_diff_shards, reconcile_keys
from .skipping import (build_scan_index, build_scan_index_for_files,
                       extend_scan_index, prune_files, pruned_lookup,
                       pruned_range_scan, stage_clustered)
from .dedup import (cosine_pairs, dedup_by_components, dedup_exact,
                    dedup_paragraphs, exact_dup_groups, flag_contamination,
                    lsh_candidate_pairs,
                    minhash_signatures, neardup_components, neardup_minhash,
                    neardup_simhash, ngram_jaccard_pairs, simhash_signatures,
                    verify_jaccard)
from .scrub import PII_RULES, scrub_pii_col, with_scrubbed_text
from .sampling import (cap_per_group, deterministic_sample, hash_split,
                       stratified_take, weighted_sample)
from .urls import (canonical_url_col, registrable_domain_col,
                   with_canonical_url)
from .rollup import (compact_cube, query_rollup,
                     query_rollup_many, rollup_group_estimates,
                     rollup_sketches)
from .relational import (count_nonempty, count_rows, distinct_count,
                         exact_membership, predecessor, sort_limit,
                         successor, top_k_by_count)
from .similarity import (ann_topk_bruteforce, ann_topk_lsh,
                         hyperplane_signatures)
from .textstats import (repetition_stats, tokenize, tokens_col,
                        with_fingerprint, with_lang_id, with_quality_score,
                        with_repetition_stats, with_token_stats)

__all__ = [
    "build_sketch", "build_grouped_sketches", "probe_membership",
    "cms_lookup", "ibf_recover", "estimate_grouped", "hash_col",
    "salted_repartition", "dedup_exact", "dedup_paragraphs",
    "exact_dup_groups",
    "minhash_signatures", "lsh_candidate_pairs", "verify_jaccard",
    "neardup_minhash", "simhash_signatures", "neardup_simhash",
    "neardup_components", "dedup_by_components", "flag_contamination",
    "ngram_jaccard_pairs", "cosine_pairs", "ann_topk_bruteforce",
    "ann_topk_lsh", "hyperplane_signatures", "tokenize", "tokens_col",
    "with_token_stats", "with_quality_score", "with_lang_id",
    "with_fingerprint", "repetition_stats", "with_repetition_stats",
    "PII_RULES", "scrub_pii_col", "with_scrubbed_text",
    "assign_token_shards",
    "sort_limit", "count_rows", "count_nonempty",
    "successor", "predecessor", "top_k_by_count", "distinct_count",
    "exact_membership",
    "probe_indices", "relative_collisions", "absolute_collisions",
    "collision_sweep_k", "collision_sweep_m",
    "bloom_semijoin", "bloom_antijoin", "estimate_join_size",
    "heavy_hitters",
    "heavy_hitters_by_group", "mg_lookup",
    "build_ibf_shards", "ibf_diff_shards", "reconcile_keys",
    "stage_clustered", "build_scan_index", "build_scan_index_for_files",
    "extend_scan_index", "prune_files", "pruned_lookup",
    "pruned_range_scan",
    "quantile_boundaries", "boundaries_from_sketch", "with_range_bucket",
    "repartition_balanced", "partition_balance",
    "hash_split", "deterministic_sample", "stratified_take",
    "weighted_sample",
    "rollup_sketches", "query_rollup", "query_rollup_many",
    "compact_cube", "rollup_group_estimates",
    "canonical_url_col", "with_canonical_url",
    "registrable_domain_col", "cap_per_group",
]
