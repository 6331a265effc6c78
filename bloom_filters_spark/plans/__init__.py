from .queries import (distinct_hosts, distinct_urls, flagship_hll_bloom,
                      heavy_hitter_tokens, host_col, round_leading_order,
                      seen_before, text_length_quantiles)

__all__ = ["distinct_urls", "distinct_hosts", "seen_before",
           "heavy_hitter_tokens", "text_length_quantiles",
           "flagship_hll_bloom", "host_col", "round_leading_order"]
