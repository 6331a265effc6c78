"""PII scrubbing for webtext curation — pure-JVM regexp chains.

Before training-data release, crawl pipelines redact personally
identifying strings (the C4/mC4 and refined-web stacks all carry a
variant of this pass). This module is the Spark-native form: a FIXED,
ORDERED chain of ``regexp_replace`` rules, every one a whole-stage-
codegen JVM expression — no Python in the hot path, no UDFs.

The rule set is deliberately conservative and DETERMINISTIC (an
auditable regex chain, not an NER model — model-based PII is an
external-service concern, out of scope by design):

  1. ``<EMAIL>``  — ``[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}``
  2. ``<CARD>``   — 16 digits in 4-groups with optional space/dash:
                    ``\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b``
  3. ``<ID>``     — SSN shape ``\\b\\d{3}-\\d{2}-\\d{4}\\b``
  4. ``<IP>``     — dotted quad ``\\b\\d{1,3}(\\.\\d{1,3}){3}\\b``
  5. ``<PHONE>``  — international ``\\+\\d{7,15}\\b``, then separated
                    NANP shape ``\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b``

Rules apply IN ORDER (card before phone, so a 16-digit card is never
half-eaten by the phone rule; email first, so user@host never leaks a
host fragment to later rules). Every pattern uses only constructs with
identical semantics in Java regex (Spark), RE2 (DuckDB) and python
``re`` with ``re.ASCII``: character classes, bounded quantifiers,
``\\b`` (ASCII), no lookaround, no backreferences — which is what
makes the chain oracle-checkable across engines. The
``string_digests`` oracle row re-implements the chain in DuckDB over a
fixed adversarial list and must reproduce the joined md5;
``fuzz_text_media`` drives randomized PII-laden strings against a
python re-implementation.

Counts (``with_scrubbed_text``) are per-rule ``regexp_count`` over the
ORIGINAL text, evaluated independently — a digit run matched by two
rules counts in both (documented; the counts are audit signals, not a
partition of the replacements).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (tag, pattern) in APPLICATION ORDER — see module docstring.
PII_RULES: list[tuple[str, str]] = [
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<CARD>", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b"),
    ("<ID>", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("<IP>", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("<PHONE>", r"\+\d{7,15}\b"),
    # the NANP form anchors its start like the other digit rules: the
    # paren alternative is anchored by the literal '(' and the bare
    # form by \b — without it, '12345.678.9012' (a serial number the
    # CARD/IP rules correctly reject) would scrub mid-run to
    # '12<PHONE>'. RE2 has no lookbehind, so the alternation IS the
    # portable spelling of "not preceded by a digit".
    ("<PHONE>", r"(\(\d{3}\)|\b\d{3})[ .-]\d{3}[ .-]\d{4}\b"),
]

# audit-count column per distinct tag (patterns sharing a tag sum)
_COUNT_COLS = {"<EMAIL>": "n_emails", "<CARD>": "n_cards",
               "<ID>": "n_ids", "<IP>": "n_ips", "<PHONE>": "n_phones"}


def scrub_pii_col(text_col: str | Column = "text") -> Column:
    """The scrubbed text as ONE nested JVM expression (NULL in →
    NULL out, via regexp_replace's own NULL propagation)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for tag, pat in PII_RULES:
        c = F.regexp_replace(c, pat, tag)
    return c


def with_scrubbed_text(df: DataFrame, text_col: str = "text",
                       out_col: str = "text_scrubbed") -> DataFrame:
    """``out_col`` plus per-rule audit counts (independent
    ``regexp_count`` over the original text, NULL text counts 0)."""
    out = df.withColumn(out_col, scrub_pii_col(text_col))
    for tag, name in _COUNT_COLS.items():
        pats = [p for t, p in PII_RULES if t == tag]
        cnt = sum((F.regexp_count(F.col(text_col), F.lit(p))
                   for p in pats[1:]),
                  F.regexp_count(F.col(text_col), F.lit(pats[0])))
        out = out.withColumn(name,
                             F.coalesce(cnt, F.lit(0)).cast("long"))
    return out
