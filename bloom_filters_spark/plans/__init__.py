from .queries import (corpus_report, distinct_hosts, distinct_urls,
                      flagship_hll_bloom, heavy_hitter_tokens, host_col,
                      prepare_corpus, round_leading_order, seen_before,
                      seen_before_onepass, select_token_budget,
                      text_length_quantiles)

__all__ = ["distinct_urls", "distinct_hosts", "seen_before",
           "seen_before_onepass", "heavy_hitter_tokens",
           "text_length_quantiles", "flagship_hll_bloom", "host_col",
           "round_leading_order", "prepare_corpus", "select_token_budget",
           "corpus_report"]
