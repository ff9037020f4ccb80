#!/usr/bin/env python
"""Scaling-efficiency harness (SURVEY.md §7.1 M8, BASELINE.json north_rule).

The north_rule's two-cluster-size criterion (N vs 4N executors, efficiency
>= 0.8) cannot use a real cluster in this sandbox; the sanctioned evidence
protocol (BASELINE.md) is: run the IDENTICAL job on the IDENTICAL generated
corpus at local[8] and local[32], report clips/sec at both plus
efficiency = (T_8 / T_32) / 4.

Each run is a separate `spark-submit --py-files` process (fresh JVM, fresh
warehouse) so nothing is shared between the two measurements except the
input parquet. A warm-up run at local[8] on a small corpus primes the OS
page cache / JIT so neither timed run pays first-launch costs.

Usage:  python BENCH/scaling.py            # default N=20000 clips
        SCALE_N=4000 python BENCH/scaling.py
Writes: BENCH/BASELINE.md (standing results table) + BENCH/scaling_results.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SCALE_N", "20000"))
SEED = 42
CPUS_PAIR = (8, 32)
REPEATS = int(os.environ.get("SCALE_REPEATS", "2"))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — the sandbox VM sees noisy-
    neighbor bursts; per-run steal% is recorded so results are auditable."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts[:8]]
    return vals[7], sum(vals)


def _zip_pkg() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "relieff_lsh_spark.zip")
    subprocess.run(
        ["zip", "-qr", zpath, "relieff_lsh_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )
    return zpath


def _corpus(n: int, seed: int) -> str:
    d = os.path.join(REPO, "BENCH", "_work", f"corpus_n{n}_s{seed}")
    marker = os.path.join(d, "_SUCCESS_GEN")
    if not os.path.exists(marker):
        from relieff_lsh_spark.sources.corpus import write_corpus

        write_corpus(n, d, seed=seed, batch_rows=500)
        open(marker, "w").close()
    return os.path.join(d, "corpus.parquet")


def _run(corpus: str, cpus: int, zpath: str, tag: str) -> dict:
    wh = os.path.join(REPO, "BENCH", "_work", f"wh_{tag}")
    subprocess.run(["rm", "-rf", wh], check=True)
    mpath = os.path.join(REPO, "BENCH", "_work", f"metrics_{tag}.json")
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local[{cpus}]",
        # builder-time spark.driver.memory is ignored under spark-submit
        # (JVM already up); in local mode the driver heap IS executor memory.
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "dedup.py"),
        "--corpus", corpus,
        "--warehouse", wh,
        "--shuffle-partitions", str(max(cpus, 32)),
        "--metrics-out", mpath,
    ]
    s0, t0j = _cpu_jiffies()
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise RuntimeError(f"run {tag} failed")
    launch_wall = round(time.time() - t0, 1)
    s1, t1j = _cpu_jiffies()
    with open(mpath) as f:
        m = json.load(f)
    m["launch_wall_seconds"] = launch_wall  # incl. JVM startup, for context
    m["steal_pct"] = round(100.0 * (s1 - s0) / max(t1j - t0j, 1), 2)
    subprocess.run(["rm", "-rf", wh], check=True)
    return m


def main() -> None:
    zpath = _zip_pkg()
    print(f"generating corpus n={N} seed={SEED} ...", flush=True)
    corpus = _corpus(N, SEED)

    print("warm-up run (local[8], n=300) ...", flush=True)
    _run(_corpus(300, 7), 8, zpath, "warmup")

    # The sandbox VM shares a host (bursty noisy-neighbor interference seen
    # up to 5x); each level runs REPEATS times and the fastest run counts —
    # interleaved (8, 32, 8, 32, ...) so a burst can't bias one level.
    runs: dict[int, dict] = {}
    attempts: dict[int, list] = {c: [] for c in CPUS_PAIR}
    for rep in range(REPEATS):
        for cpus in CPUS_PAIR:
            print(f"timed run local[{cpus}] rep {rep} ...", flush=True)
            m = _run(corpus, cpus, zpath, f"c{cpus}_n{N}_r{rep}")
            attempts[cpus].append(m)
            print(f"  local[{cpus}] rep {rep}: {m['wall_seconds']}s "
                  f"({m['clips_per_sec']} clips/s, steal {m['steal_pct']}%)",
                  flush=True)
    for cpus in CPUS_PAIR:
        runs[cpus] = min(attempts[cpus], key=lambda m: m["wall_seconds"])

    t8 = runs[8]["wall_seconds"]
    t32 = runs[32]["wall_seconds"]
    eff = round((t8 / t32) / (CPUS_PAIR[1] / CPUS_PAIR[0]), 3)
    result = {
        "n_clips": N,
        "seed": SEED,
        "repeats": REPEATS,
        "runs": {
            str(c): {
                "wall_seconds": runs[c]["wall_seconds"],
                "clips_per_sec": runs[c]["clips_per_sec"],
                "steal_pct": runs[c]["steal_pct"],
                "all_walls": [m["wall_seconds"] for m in attempts[c]],
                "stage_seconds": {
                    s: runs[c]["stages"][s]["seconds"]
                    for s in ("signatures", "candidates", "verified", "components")
                },
                "summary": runs[c]["stages"]["summary"],
            }
            for c in CPUS_PAIR
        },
        "scaling_efficiency_8_to_32": eff,
        "meets_0.8_target": eff >= 0.8,
    }
    # sanity: identical outputs at both parallelism levels
    s8, s32 = runs[8]["stages"]["summary"], runs[32]["stages"]["summary"]
    result["outputs_identical"] = (
        s8["n_components"] == s32["n_components"]
        and s8["clips_in_dup_groups"] == s32["clips_in_dup_groups"]
    )

    with open(os.path.join(REPO, "BENCH", "scaling_results.json"), "w") as f:
        json.dump(result, f, indent=2)

    md = f"""# BENCH/BASELINE.md — measured scaling results

Protocol (BASELINE.md): identical `spark-submit --py-files` job, identical
deterministically-generated corpus (n={N}, seed={SEED}), two parallelism
levels standing in for N vs 4N executors. Fresh JVM + fresh warehouse per
run; one warm-up run precedes the timed runs; each level timed {REPEATS}x
interleaved and the fastest run counts (the sandbox VM shows bursty
noisy-neighbor interference; per-run host-steal%% is recorded in
scaling_results.json). Wall time is the in-job pipeline wall clock
(excludes JVM startup).

| master | wall (s) | clips/sec | signatures (s) | candidates (s) | verified (s) | components (s) |
|---|---|---|---|---|---|---|
| local[8]  | {t8} | {runs[8]['clips_per_sec']} | {runs[8]['stages']['signatures']['seconds']} | {runs[8]['stages']['candidates']['seconds']} | {runs[8]['stages']['verified']['seconds']} | {runs[8]['stages']['components']['seconds']} |
| local[32] | {t32} | {runs[32]['clips_per_sec']} | {runs[32]['stages']['signatures']['seconds']} | {runs[32]['stages']['candidates']['seconds']} | {runs[32]['stages']['verified']['seconds']} | {runs[32]['stages']['components']['seconds']} |

**Scaling efficiency (T_8 / T_32) / 4 = {eff}** (target >= 0.8: {"MET" if eff >= 0.8 else "NOT MET"})

Outputs identical at both levels: {result['outputs_identical']}
(n_components={s32['n_components']}, clips_in_dup_groups={s32['clips_in_dup_groups']}).

Reproduce: `SCALE_N={N} python BENCH/scaling.py`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
