"""Per-stage scaling diagnosis: run the dedup job at two core counts with
Spark event logs on, then decompose each pipeline stage's wall into
  busy      — sum of task executorRunTime / cores
  cpu       — sum of task executorCpuTime (actual cycles, incl. stalls)
  gc        — sum of task jvmGCTime
  idle      — wall*cores - busy (scheduling gaps, driver-only time, tails)
so the 2->8-core efficiency loss (BENCH/BASELINE.md gate) can be attributed
to CPU inflation (cpu8 > cpu2 for identical work: memory-bus stalls, GC)
vs utilization loss (idle8 >> idle2: barriers, stragglers, driver phases).

Usage: python BENCH/stage_profile.py [n] [cpus,cpus]
Writes BENCH/_work/profile_c{N}.json + prints a comparison table.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
CPUS = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "2,8").split(",")]
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
WORK = os.path.join(REPO, "BENCH", "_work")


def corpus_path(n: int) -> str:
    d = f"/dev/shm/spark_graft_bench/corpus_n{n}_s42_b100"
    if not os.path.exists(os.path.join(d, "_SUCCESS_GEN")):
        from relieff_lsh_spark.sources.corpus import write_corpus

        write_corpus(n, d, seed=42, batch_rows=100, procs=16)
        open(os.path.join(d, "_SUCCESS_GEN"), "w").close()
    return os.path.join(d, "corpus.parquet")


def zip_pkg() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    z = os.path.join(dist, "relieff_lsh_spark.zip")
    if os.path.exists(z):
        os.remove(z)
    subprocess.run(["zip", "-qr", z, "relieff_lsh_spark", "-x", "*__pycache__*"],
                   cwd=REPO, check=True)
    return z


def run(corpus: str, cpus: int, z: str) -> tuple[dict, str]:
    tag = f"prof_c{cpus}_n{N}"
    wh = f"/dev/shm/spark_graft_bench/wh_{tag}"
    evd = os.path.join(WORK, f"ev_{tag}")
    subprocess.run(["rm", "-rf", wh, evd], check=True)
    os.makedirs(evd, exist_ok=True)
    mpath = os.path.join(WORK, f"metrics_{tag}.json")
    mem = os.environ.get("SPARK_DRIVER_MEM", "16g")
    cmd = [
        SPARK_SUBMIT, "--master", f"local[{cpus}]",
        "--driver-memory", mem,
        "--conf", f"spark.driver.extraJavaOptions=-Xms{mem} -XX:+AlwaysPreTouch "
                  "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir=file://{evd}",
        *[x for kv in os.environ.get("PROFILE_EXTRA_CONF", "").split(";") if kv
          for x in ("--conf", kv)],
        "--py-files", z,
        os.path.join(REPO, "jobs", "dedup.py"),
        "--corpus", corpus, "--warehouse", wh,
        "--shuffle-partitions", str(max(cpus, 32)),
        "--metrics-out", mpath,
    ]
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-5000:])
        raise RuntimeError(f"run c{cpus} failed")
    print(f"  local[{cpus}] launch wall {time.time()-t0:.1f}s", flush=True)
    with open(mpath) as f:
        m = json.load(f)
    subprocess.run(["rm", "-rf", wh], check=True)
    ent = [os.path.join(evd, f) for f in os.listdir(evd)
           if not f.startswith(".")][0]
    if os.path.isdir(ent):  # Spark 4 rolling event-log dir
        parts = sorted(
            os.path.join(ent, f) for f in os.listdir(ent)
            if "events" in f
        )
        return m, parts
    return m, [ent]


def _iter_lines(evfiles: list[str]):
    for p in evfiles:
        if p.endswith(".zstd"):
            proc = subprocess.Popen(["zstd", "-dc", p], stdout=subprocess.PIPE,
                                    text=True)
            yield from proc.stdout
            proc.wait()
        else:
            with open(p) as f:
                yield from f


def parse_events(evfiles: list[str]) -> dict:
    """-> {stage_id: {name, submit_ms, complete_ms, run_ms, cpu_ms, gc_ms,
    n_tasks, max_task_ms}} plus job spans."""
    stages: dict[int, dict] = {}
    apps = {"start": None, "end": None}
    if True:
        for line in _iter_lines(evfiles):
            e = json.loads(line)
            ev = e.get("Event")
            if ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                tm = e.get("Task Metrics") or {}
                info = e.get("Task Info") or {}
                s = stages.setdefault(sid, dict(
                    run_ms=0, cpu_ms=0, gc_ms=0, n_tasks=0, max_task_ms=0,
                    deser_ms=0, ser_ms=0, shuffle_w_ms=0, shuffle_fetch_ms=0,
                ))
                run = tm.get("Executor Run Time", 0)
                s["run_ms"] += run
                s["cpu_ms"] += tm.get("Executor CPU Time", 0) / 1e6
                s["gc_ms"] += tm.get("JVM GC Time", 0)
                s["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                s["ser_ms"] += tm.get("Result Serialization Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                s["shuffle_w_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                sr = tm.get("Shuffle Read Metrics") or {}
                s["shuffle_fetch_ms"] += sr.get("Fetch Wait Time", 0)
                s["n_tasks"] += 1
                dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                s["max_task_ms"] = max(s["max_task_ms"], dur)
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                s = stages.setdefault(sid, {})
                s["name"] = si.get("Stage Name", "")[:60]
                s["submit_ms"] = si.get("Submission Time")
                s["complete_ms"] = si.get("Completion Time")
            elif ev == "SparkListenerApplicationStart":
                apps["start"] = e.get("Timestamp")
            elif ev == "SparkListenerApplicationEnd":
                apps["end"] = e.get("Timestamp")
    return {"stages": stages, "app": apps}


def summarize(m: dict, ev: dict, cpus: int) -> dict:
    stages = ev["stages"]
    total = dict(run_s=0.0, cpu_s=0.0, gc_s=0.0, n_stages=0, n_tasks=0)
    spans = []
    for sid, s in sorted(stages.items()):
        if "run_ms" not in s:
            continue
        total["run_s"] += s["run_ms"] / 1e3
        total["cpu_s"] += s["cpu_ms"] / 1e3
        total["gc_s"] += s["gc_ms"] / 1e3
        total["n_stages"] += 1
        total["n_tasks"] += s["n_tasks"]
        if s.get("submit_ms") and s.get("complete_ms"):
            spans.append((s["submit_ms"], s["complete_ms"]))
    # stage-covered wall: union of stage spans; gaps = driver-only time
    spans.sort()
    covered = 0
    cur_lo, cur_hi = None, None
    for lo, hi in spans:
        if cur_lo is None:
            cur_lo, cur_hi = lo, hi
        elif lo <= cur_hi:
            cur_hi = max(cur_hi, hi)
        else:
            covered += cur_hi - cur_lo
            cur_lo, cur_hi = lo, hi
    if cur_lo is not None:
        covered += cur_hi - cur_lo
    app_wall = (ev["app"]["end"] - ev["app"]["start"]) / 1e3 \
        if ev["app"]["start"] and ev["app"]["end"] else None
    pipeline_wall = m["wall_seconds"]
    out = {
        "cpus": cpus,
        "pipeline_wall_s": pipeline_wall,
        "app_wall_s": round(app_wall, 1) if app_wall else None,
        "stage_covered_wall_s": round(covered / 1e3, 1),
        "driver_gap_s": round(app_wall - covered / 1e3, 1) if app_wall else None,
        "task_run_core_s": round(total["run_s"], 1),
        "task_cpu_core_s": round(total["cpu_s"], 1),
        "task_gc_core_s": round(total["gc_s"], 1),
        "n_stages": total["n_stages"],
        "n_tasks": total["n_tasks"],
        "busy_frac": round(total["run_s"] / (pipeline_wall * cpus), 3),
        "cpu_frac": round(total["cpu_s"] / (pipeline_wall * cpus), 3),
        "stage_seconds": {k: v["seconds"] for k, v in m["stages"].items()
                          if isinstance(v, dict) and "seconds" in v},
    }
    return out


def main():
    z = zip_pkg()
    corpus = corpus_path(N)
    subprocess.run(f"cat {corpus}/part-*.parquet > /dev/null", shell=True,
                   check=False)
    results = {}
    for cpus in CPUS:
        print(f"run local[{cpus}] n={N} ...", flush=True)
        m, evfile = run(corpus, cpus, z)
        results[cpus] = summarize(m, parse_events(evfile), cpus)
        print(json.dumps(results[cpus], indent=1), flush=True)
    with open(os.path.join(WORK, f"profile_n{N}.json"), "w") as f:
        json.dump(results, f, indent=1)
    if len(CPUS) == 2:
        lo, hi = CPUS
        a, b = results[lo], results[hi]
        print("\n=== 2-level comparison ===")
        eff = (a["pipeline_wall_s"] / b["pipeline_wall_s"]) / (hi / lo)
        print(f"efficiency: {eff:.3f}")
        print(f"cpu inflation (task cpu hi/lo): "
              f"{b['task_cpu_core_s']/a['task_cpu_core_s']:.3f}")
        print(f"busy frac: {a['busy_frac']} -> {b['busy_frac']}")
        print(f"driver gap: {a['driver_gap_s']}s -> {b['driver_gap_s']}s")
        print(f"gc core-s: {a['task_gc_core_s']} -> {b['task_gc_core_s']}")


if __name__ == "__main__":
    main()
