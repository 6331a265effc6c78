"""Randomized differential fuzz: dedup family + balanced partitioner.

Closes the one operator family without a dedicated randomized pass
(kernels, skipping, reconcile, sharded-delete, rollup_many all have
one — NOTES_r4/r5). Each trial builds a random corpus with planted
near-dup clusters and edge docs (empty, whitespace-only, single-token,
exact duplicates, repeated-token), then checks:

  1. ngram_jaccard_pairs (exact mode, df_cut=None) against an
     INDEPENDENT python brute-force oracle that re-implements the
     documented tokenize→shingle→jaccard semantics (lower/trim/\\s+
     split, distinct n-gram join, whole-text shingle for short docs,
     round(j,6) >= threshold) — pair-set equality AND per-pair jaccard
     equality;
  2. neardup_minhash — zero false positives (every returned pair's
     jaccard re-derived exactly and >= threshold), returned pairs are
     a subset of the exact-pair oracle, and a planted pair with exact
     jaccard >= 0.9 is ALWAYS found at threshold 0.5 / 64 perms / 16
     bands (miss probability ~(1-0.9^4)^16 < 4e-8 — a failure is a
     bug, not luck);
  3. neardup_simhash pigeonhole completeness — the returned pair set
     EQUALS the brute-force all-pairs hamming<=r set over the
     operator's own signatures (r < chunks, no bucket cap), with exact
     hamming values;
  4. quantile_boundaries → partition_balance — every bucket count
     within n/k ± (2·ε·n + max tie multiplicity + 1) for KLL(200)
     ε=0.04, over uniform / lognormal / zipf-with-ties draws;
  5. neardup_components vs an independent union-find oracle over a
     random pair graph — random id domains (incl. 2^61-scale),
     duplicate/reversed edges, self-loops, NULL ids, and a planted
     long chain that forces real pointer-jumping rounds.;
  6. flag_contamination vs the same python shingle oracle — random
     shingle width (incl. the production 13-gram rule), eval subset
     drawn from the corpus itself, exact flag-set equality;
  7. dedup_paragraphs vs an independent python keep-first oracle —
     docs sharing a paragraph pool (cross-doc AND within-doc
     repeats), NULL/blank docs, multi-line paragraphs, separator
     runs incl. \\n\\t\\n (NOT a break) — reassembled text and
     kept/total counts exactly equal.

Run: python scripts/fuzz_dedup.py [n_trials]  (default 12, ~4 min)
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bloom_filters_spark.session import get_spark  # noqa: E402
from bloom_filters_spark.operators import dedup  # noqa: E402
from bloom_filters_spark.operators.partitioning import (  # noqa: E402
    partition_balance, quantile_boundaries)

FAILS: list[str] = []


def check(ok, msg):
    if not ok:
        FAILS.append(msg)
        print("FAIL:", msg)


# ---------------------------------------------------------------- oracle

def py_tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split() if t != ""]


def py_shingles(text: str, n: int) -> frozenset:
    toks = py_tokens(text)
    if n <= 1:
        return frozenset(toks)
    if len(toks) >= n:
        return frozenset(" ".join(toks[i:i + n]) for i in
                         range(len(toks) - n + 1))
    if toks:
        return frozenset([" ".join(toks)])
    return frozenset()


def py_jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return round(len(a & b) / u, 6) if u else 0.0


def exact_pairs(docs: dict[int, str], n: int, thr: float) -> dict:
    sh = {i: py_shingles(t, n) for i, t in docs.items()}
    ids = sorted(docs)
    out = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            i1, i2 = ids[ai], ids[bi]
            j = py_jaccard(sh[i1], sh[i2])
            if j >= thr:
                out[(i1, i2)] = j
    return out


# --------------------------------------------------------------- corpus

def make_corpus(rng) -> dict[int, str]:
    vocab = [f"w{rng.integers(0, 10**6)}" for _ in
             range(int(rng.integers(40, 300)))]
    docs: dict[int, str] = {}
    nid = 0
    for _ in range(int(rng.integers(30, 80))):
        ln = int(rng.integers(1, 50))
        docs[nid] = " ".join(rng.choice(vocab, ln))
        nid += 1
    # planted near-dup clusters at several mutation rates
    for rho in (0.02, 0.05, 0.15, 0.35):
        base_id = int(rng.choice(list(docs)))
        toks = py_tokens(docs[base_id])
        if not toks:
            continue
        for _ in range(int(rng.integers(1, 3))):
            mut = [w if rng.random() > rho else str(rng.choice(vocab))
                   for w in toks]
            docs[nid] = " ".join(mut)
            nid += 1
    # edge docs
    docs[nid] = ""; nid += 1
    docs[nid] = "   \t  "; nid += 1
    docs[nid] = "solo"; nid += 1
    docs[nid] = docs[int(rng.choice(list(docs)[:5]))]; nid += 1  # exact dup
    docs[nid] = "rep rep rep rep rep"; nid += 1
    return docs


def spark_pairs(df_pairs) -> dict:
    return {(int(r["id1"]), int(r["id2"])): float(r["jaccard"])
            for r in df_pairs.collect()}


# ---------------------------------------------------------------- trials

def trial_ngram_exact(spark, rng, docs, sdf, seed):
    n = int(rng.choice([1, 2, 3]))
    thr = float(rng.choice([0.31, 0.52, 0.77]))
    got = spark_pairs(dedup.ngram_jaccard_pairs(
        sdf, "doc_id", "text", n=n, threshold=thr, df_cut=None))
    want = exact_pairs(docs, n, thr)
    check(set(got) == set(want),
          f"ngram pair set n={n} thr={thr} seed={seed}: "
          f"extra={set(got) - set(want)} missing={set(want) - set(got)}")
    for k in set(got) & set(want):
        check(abs(got[k] - want[k]) <= 1e-6,
              f"ngram jaccard value {k} {got[k]} vs {want[k]} seed={seed}")


def trial_minhash(spark, rng, docs, sdf, seed):
    shingle = int(rng.choice([1, 2]))
    got = spark_pairs(dedup.neardup_minhash(
        sdf, "doc_id", "text", threshold=0.5, num_perm=64, bands=16,
        seed=int(rng.integers(0, 2**31)), shingle=shingle))
    want = exact_pairs(docs, shingle, 0.5)
    # no false positives, values exact, subset of the exact oracle
    for k, j in got.items():
        check(k in want and abs(j - want[k]) <= 1e-6,
              f"minhash FALSE POSITIVE/val {k}={j} shingle={shingle} "
              f"seed={seed}")
    # every >=0.9-jaccard pair must be recalled (miss prob < 4e-8/pair)
    for k, j in want.items():
        if j >= 0.9:
            check(k in got,
                  f"minhash MISSED high-sim pair {k} j={j} "
                  f"shingle={shingle} seed={seed}")


def trial_simhash_complete(spark, rng, docs, sdf, seed):
    chunks = int(rng.choice([8, 16]))
    r = int(rng.integers(1, chunks))  # r < chunks → pigeonhole-complete
    hseed = int(rng.integers(0, 2**31))
    sigs = {int(row["id"]): int(row["simhash"]) for row in
            dedup.simhash_signatures(sdf, "doc_id", "text",
                                     seed=hseed).collect()}
    ids = sorted(sigs)
    want = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            i1, i2 = ids[ai], ids[bi]
            d = bin((sigs[i1] ^ sigs[i2]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= r:
                want[(i1, i2)] = d
    out = dedup.neardup_simhash(sdf, "doc_id", "text", max_hamming=r,
                                chunks=chunks, seed=hseed)
    got = {(int(x["id1"]), int(x["id2"])): int(x["hamming"])
           for x in out.collect()}
    check(got == want,
          f"simhash completeness chunks={chunks} r={r} seed={seed}: "
          f"extra={set(got) - set(want)} missing={set(want) - set(got)} "
          f"or hamming mismatch")


def trial_partitioner(spark, rng, seed):
    kind = rng.choice(["uniform", "lognormal", "zipf_ties"])
    n = int(rng.integers(2_000, 20_000))
    if kind == "uniform":
        vals = rng.uniform(-1e6, 1e6, n)
    elif kind == "lognormal":
        vals = rng.lognormal(3.0, 2.0, n)
    else:
        vals = rng.zipf(1.7, n).clip(max=10_000).astype(float)
    k = int(rng.choice([4, 8, 16]))
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    cuts, _sk, _n = quantile_boundaries(df, "v", k)
    counts = {int(x["bucket"]): int(x["n_rows"]) for x in
              partition_balance(df, "v", cuts).collect()}
    check(sum(counts.values()) == n,
          f"partitioner lost rows {sum(counts.values())}!={n} seed={seed}")
    _, tie = np.unique(vals, return_counts=True)
    bound = n / k + 2 * 0.04 * n + int(tie.max()) + 1
    for b, c in counts.items():
        check(c <= bound,
              f"partitioner bucket {b} count {c} > bound {bound:.0f} "
              f"dist={kind} k={k} seed={seed}")


def trial_components(spark, rng, seed):
    """Connected components (`neardup_components`) vs an independent
    union-find oracle over a random pair graph: random edge count and
    id domain (including 2^61-scale ids), duplicate + reversed edges,
    self-loops and NULL ids (both contribute nothing), plus one long
    planted chain so convergence needs real pointer-jumping rounds."""
    import pandas as pd
    from bloom_filters_spark.operators import neardup_components

    n_edges = int(rng.integers(30, 300))
    base = int(rng.choice([0, 1 << 61]))
    dom = int(rng.integers(20, 150))
    raw = rng.integers(0, dom, size=(n_edges, 2))
    pairs = [(base + int(a), base + int(b)) for a, b in raw]
    # planted chain through FRESH ids (forces label paths to shorten)
    chain_ids = [base + dom + i for i in range(int(rng.integers(5, 40)))]
    pairs += list(zip(chain_ids, chain_ids[1:]))
    # adversarial rows: self-loops, NULLs, reversed duplicates
    pairs += [(base + 1, base + 1), (None, base + 2), (base + 3, None)]
    pairs += [(b, a) for a, b in pairs[: 5] if a is not None and b is not None]

    def uf(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            if a is None or b is None or a == b:
                continue
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    # randomly exercise long AND string id types (strings: zero-padded
    # so lexicographic == numeric order and the union-find oracle's
    # min() agrees), plus the driver fast path AND distributed rounds
    id_kind = rng.choice(["long", "string"])
    if id_kind == "string":
        pairs = [tuple(None if x is None else f"u{x:021d}" for x in p)
                 for p in pairs]
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id1", "id2"], dtype="object"),
        f"id1 {id_kind}, id2 {id_kind}").repartition(
        int(rng.integers(1, 9)))
    cap = int(rng.choice([0, 1 << 20]))
    got = {r["id"]: r["rep"]
           for r in neardup_components(df, driver_edge_cap=cap).collect()}
    want = uf(pairs)
    check(got == want,
          f"components mismatch seed={seed} cap={cap} kind={id_kind}: "
          f"only_got={dict(set(got.items()) - set(want.items()))} "
          f"only_want={dict(set(want.items()) - set(got.items()))}")



def trial_contamination(spark, rng, docs, sdf, seed):
    """flag_contamination vs the independent python shingle oracle:
    random n (incl. the production 13), random eval subset of the
    corpus itself (so planted near-dups and edge docs — empty,
    whitespace-only, exact-dup — land on both sides); a doc is
    contaminated iff its shingle set intersects the eval set's."""
    from bloom_filters_spark.operators.dedup import flag_contamination

    n = int(rng.choice([2, 5, 13]))
    k = min(3, len(docs))
    eval_ids = [int(x) for x in
                rng.choice(sorted(docs), size=k, replace=False)]
    ev_sh = set()
    for i in eval_ids:
        ev_sh |= py_shingles(docs[i], n)
    want = {i: bool(py_shingles(t, n) & ev_sh) for i, t in docs.items()}
    got = {int(r["doc_id"]): bool(r["contaminated"])
           for r in flag_contamination(
               sdf, sdf.where(F.col("doc_id").isin(eval_ids)),
               n=n).collect()}
    check(got == want,
          f"contamination mismatch n={n} eval={eval_ids} seed={seed}: "
          f"diff={ {i for i in got if got[i] != want[i]} }")


def trial_paragraphs(spark, rng, seed):
    """dedup_paragraphs vs an independent python keep-first oracle:
    random multi-paragraph docs sharing a paragraph pool (so
    cross-doc and within-doc repeats both occur), blank/NULL docs,
    paragraphs containing single newlines, random separator runs."""
    from bloom_filters_spark.operators import dedup_paragraphs
    pool = [f"para {i} " + " ".join(f"t{rng.integers(0, 50)}"
                                    for _ in range(int(rng.integers(1, 8))))
            for i in range(int(rng.integers(4, 25)))]
    pool += ["multi\nline\npara", " padded ", "\ttab lead"]
    docs: list[str | None] = []
    for _ in range(int(rng.integers(10, 40))):
        style = int(rng.integers(0, 10))
        if style == 0:
            docs.append(None); continue
        if style == 1:
            docs.append(str(rng.choice(["", "\n\n", " \n\n\t "])))
            continue
        k = int(rng.integers(1, 8))
        ps = [str(pool[int(rng.integers(0, len(pool)))])
              for _ in range(k)]
        sep = str(rng.choice(["\n\n", "\n\n\n", "\n\t\n"]))
        # \n\t\n is NOT a paragraph break (needs 2+ consecutive \n)
        docs.append(sep.join(ps))
    sdf = spark.createDataFrame(list(enumerate(docs)),
                                "doc_id long, text string")
    # 1/3 of trials run the LINE unit (split_regex="\n"), the rest the
    # paragraph default — same oracle with the matching split/join
    line_unit = rng.random() < 1 / 3
    split_pat, join_sep = (r"\n", "\n") if line_unit else (r"\n{2,}",
                                                             "\n\n")
    if line_unit:
        out_df = dedup_paragraphs(sdf, split_regex=r"\n", join_sep="\n")
    else:
        out_df = dedup_paragraphs(sdf)
    got = {r["doc_id"]: r.asDict() for r in out_df.collect()}
    seen: set[str] = set()
    for i, d in enumerate(docs):
        g = got[i]
        if d is None:
            check(g["text_dedup"] is None and g["n_paras"] == 0,
                  f"paras NULL doc {i} seed={seed}: {g}")
            continue
        ps = [p for p in re.split(split_pat, d)
              if re.search(r"\S", p, flags=re.ASCII)]
        kept = []
        for p in ps:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want = join_sep.join(kept)
        check(g["text_dedup"] == want,
              f"paras text doc {i} seed={seed}: "
              f"got={g['text_dedup']!r} want={want!r}")
        check(g["n_paras"] == len(ps) and g["n_paras_kept"] == len(kept),
              f"paras counts doc {i} seed={seed}: {g} "
              f"want n={len(ps)} kept={len(kept)}")


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    spark = get_spark("fuzz-dedup", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    for t in range(n_trials):
        seed = 7_700_000 + t
        rng = np.random.default_rng(seed)
        docs = make_corpus(rng)
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())}))
        for fn in (trial_ngram_exact, trial_minhash,
                   trial_simhash_complete, trial_contamination):
            try:
                fn(spark, rng, docs, sdf, seed)
            except Exception as e:  # noqa: BLE001
                import traceback
                FAILS.append(f"{fn.__name__} seed={seed}: {e!r}")
                traceback.print_exc()
        for fn in (trial_partitioner, trial_components, trial_paragraphs):
            try:
                fn(spark, rng, seed)
            except Exception as e:  # noqa: BLE001
                import traceback
                FAILS.append(f"{fn.__name__} seed={seed}: {e!r}")
                traceback.print_exc()
        print(f"# trial {t + 1}/{n_trials} done ({len(FAILS)} failures)")
    print(f"done: {n_trials} trials x 7 properties, {len(FAILS)} failures")
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
