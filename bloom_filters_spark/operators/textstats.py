"""Text analysis over document tables — all JVM-side built-ins.

Large-scale training-data pipeline operators (driver brief): token
counting, quality scoring, language ID (stopword-marker heuristic),
document fingerprinting. Everything here stays inside whole-stage
codegen (F.* expressions only — no Python in the hot path); the
tokenizer matches the reference's whitespace split + lowercase
(Bloom_project/src/core/Utils.cpp:58-66, :63).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# whitespace tokenization parity: std::stringstream >> word
TOKEN_SPLIT = r"\s+"

# tiny per-language marker lexicons (deterministic heuristic, not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ich", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por", "con", "para"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "он", "по", "но"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def tokens_col(text_col: str | Column, lowercase: bool = True) -> Column:
    """array<string> of non-empty whitespace tokens."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(F.trim(c), TOKEN_SPLIT), lambda t: t != "")


def tokenize(df: DataFrame, text_col: str = "text",
             out_col: str = "token", lowercase: bool = True) -> DataFrame:
    """One row per token (the reference's per-line word loop,
    Bloom_project/src/core/Bloom_project.cpp:527-535, as explode/split)."""
    return df.select("*", F.explode(tokens_col(text_col, lowercase))
                     .alias(out_col))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars, avg token length, distinct-token ratio."""
    toks = tokens_col(text_col)
    return (df
            .withColumn("n_tokens", F.size(toks))
            .withColumn("n_chars_calc", F.length(F.col(text_col)))
            .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
            .withColumn("avg_token_len",
                        F.round((F.length(F.regexp_replace(
                            F.col(text_col), r"\s+", "")))
                            / F.greatest(F.size(toks), F.lit(1)), 4))
            .withColumn("type_token_ratio",
                        F.round(F.size(F.array_distinct(toks))
                                / F.greatest(F.size(toks), F.lit(1)), 4)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length band, punctuation density,
    stopword ratio, repetition — combined into [0, 1]."""
    toks = tokens_col(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
    stop_ratio = (F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in STOPWORDS])))
        / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)))
    length_ok = (F.size(toks) >= 5) & (F.size(toks) <= 100_000)
    punct_ratio = punct / F.greatest(F.length(F.col(text_col)), F.lit(1))
    rep_ratio = 1.0 - F.size(F.array_distinct(toks)) / n_tok.cast("double")
    # coalesce the stopword ratio BEFORE least: F.least SKIPS null
    # arguments, so least(NULL, 1.0) is already the non-NULL 1.0 and a
    # coalesce wrapped AROUND it never fires — a NULL text (stop_ratio
    # NULL) would collect the full 0.2 as "ideal stopword density"
    # instead of scoring 0 (fuzz_text_media caught the outside-coalesce
    # form doing exactly that)
    score = (F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
             + F.when(punct_ratio < 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
             + F.when(rep_ratio < 0.9, F.lit(0.2)).otherwise(F.lit(0.0))
             + (F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 4,
                        F.lit(1.0)) * 0.2))
    return (df.withColumn("punct_ratio", F.round(punct_ratio, 4))
            .withColumn("stopword_ratio", F.round(stop_ratio, 4))
            .withColumn("repetition_ratio", F.round(rep_ratio, 4))
            .withColumn("quality_score", F.round(score, 4)))


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_guess") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hits,
    deterministic tie-break by language code; 'und' when nothing hits."""
    toks = F.array_distinct(tokens_col(text_col))
    scores = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(w) for w in ws]))).alias("hits"),
            # struct comparison orders by (hits, code): ties on hits
            # break deterministically to the lexicographically largest code
            F.lit(code).alias("code"))
        for code, ws in sorted(LANG_MARKERS.items())])
    best = F.array_max(scores)
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints:
    - fingerprint_md5: md5 of the canonicalized token stream (sorted
      distinct lowercase tokens) — content-defined, order-insensitive;
    - fingerprint_roll: polynomial rolling hash over token lengths+heads
      (cheap shingle-free signature), computed with F.aggregate."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens_col(text_col))),
                         " ")
    toks = tokens_col(text_col)
    roll = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(131) + F.length(t) * F.lit(31)
            + (F.ascii(t) + F.lit(7)), F.lit(1_000_000_007)))
    return (df.withColumn("fingerprint_md5", F.md5(canon))
            .withColumn("fingerprint_roll", roll))
