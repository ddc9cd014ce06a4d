"""Benchmark harness: headline sketch queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

The queries here are the *pure* sketch pipelines (no oracle-check
overhead) — the Spark twins of the reference README's 10M-row
grouped-percentile experiment and scripts/bechmark.sql grid.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _settle(max_wait: float = 150.0, target: float | None = None) -> float:
    """Wait (bounded) for the box's 1-minute load average to drop below
    ~1/4 of the bench cores before a latency-sensitive measurement.

    The driver records bench.py right after its own pytest + oracle
    passes, when the box still carries their load tail — measured
    uniformly ~14-25% slower README-pair numbers in that state
    (BENCH.md, rounds 3-4).  Settling costs bounded wall clock and
    removes the see-saw; the observed load is recorded in the output
    so a still-hot box is visible in the number's provenance."""
    if target is None:
        target = max(4.0, 0.25 * CPUS)
    deadline = time.time() + max_wait
    load = os.getloadavg()[0]
    while load > target and time.time() < deadline:
        time.sleep(5.0)
        load = os.getloadavg()[0]
    return load


def _read_steal() -> tuple[int, int]:
    """(steal ticks, total ticks) from /proc/stat — co-tenant CPU steal
    on this virtualized box is the dominant noise source for the ~1 s
    README-pair jobs (measured: 5.6% average steal across 32 vCPUs
    during a run ≈ ~35% interference on the few busy cores, moving
    local[4] between 1.0 and 1.8 s on an otherwise idle box)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:11]]
        return vals[7], sum(vals)
    except Exception:  # noqa: BLE001 — non-Linux or restricted /proc
        return 0, 0


def _canary_cpu_worker(_i: int) -> float:
    """One parallel-canary worker: median of 5 single-threaded
    compute-bound passes (numpy ufuncs don't multithread).  Module-level
    so ProcessPoolExecutor can pickle it."""
    import numpy as np

    x = np.linspace(0.0, 1.0, 4_000_000)
    np.sin(x)  # warm the buffer + ufunc
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.sin(x).sum())
        times.append(time.perf_counter() - t0)
    return 1000.0 * sorted(times)[2]


def _canary(reps: int = 5) -> dict:
    """Box-capacity canary, recorded as provenance in the bench JSON.

    Two probes, because two distinct invisible-to-load1/steal%
    interference modes were observed on this shared VM (2026-08-17):

    - ``stream_ms``: single-threaded 256 MB array stream — catches
      co-tenant MEMORY pressure (bus/L3 saturation steals no ticks).
    - ``cpu4_ms`` / ``cpu4_max_ms``: mean and MAX per-worker time of a
      4-way parallel compute-bound probe vs its single-thread floor.
      Catches degraded/uneven host CPU allocation: in the observed
      window, single-thread compute was rock-stable (25.9 ms) and the
      stream canary clean (27.9 ms), yet the 4-way max ran 40.7 ms
      (1.57×) — and a Spark stage runs at the speed of its SLOWEST
      task, which is exactly why README local[4] sat at 1,318-1,367 ms
      (≈1.45× its 901-1,004 ms quiet band) with load 0.5-2.0 and steal
      ≤1% all clean.  Steady-state in-session reps confirmed the
      slowdown was real, not warmup.

    Calibrate across records — compare canaries BETWEEN bench JSONs,
    not to an absolute bar.  Pure provenance, never a retry trigger:
    host-level contention cannot be settled away, only explained."""
    from concurrent.futures import ProcessPoolExecutor

    import numpy as np

    a = np.ones(32_000_000)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(a.sum())
        times.append(time.perf_counter() - t0)
        assert s > 0.0
    out = {"stream_ms": round(1000.0 * sorted(times)[len(times) // 2], 1)}
    try:
        with ProcessPoolExecutor(4) as ex:
            per_worker = list(ex.map(_canary_cpu_worker, range(4)))
        out["cpu4_ms"] = round(sum(per_worker) / len(per_worker), 1)
        out["cpu4_max_ms"] = round(max(per_worker), 1)
    except Exception:  # noqa: BLE001 — provenance must never fail the bench
        pass
    return out


def _run(fn):
    """Run one query action, retrying ONCE on a transient Spark error.

    The bench is recorded from a single driver invocation; a one-off
    executor/launcher hiccup (observed once: a LazyTry failure on the
    first post-pytest run) shouldn't zero the round.  A second
    consecutive failure is a real bug and propagates.
    """
    try:
        return fn()
    except Exception as exc:  # noqa: BLE001 — deliberate single retry
        print(f"bench: retrying after transient error: {exc!r}"[:300],
              file=sys.stderr)
        time.sleep(2.0)
        return fn()


def _timed_rep(fn) -> float:
    """One timed measurement; a transient failure discards the broken
    attempt and re-times from scratch (retrying inside the timed window
    would inflate the recorded number)."""
    try:
        t0 = time.time()
        fn()
        return time.time() - t0
    except Exception as exc:  # noqa: BLE001 — deliberate single retry
        print(f"bench: re-timing rep after transient error: {exc!r}"[:300],
              file=sys.stderr)
        time.sleep(2.0)
        t0 = time.time()
        fn()
        return time.time() - t0


def bench_queries(spark, sf_dir):
    """name -> (fn, rows_processed_fn). Each fn triggers a full action."""
    from pyspark.sql import functions as F

    from tdigest_spark.spark.tdigest_agg import (
        tdigest,
        tdigest_avg,
        tdigest_percentile,
        tdigest_percentile_digests,
        tdigest_percentile_of,
        tdigest_union_agg,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_quantity"
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", F.col("n_chars").cast("double").alias("n_chars"))
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")

    def q_build_p95_grouped():
        return tdigest_percentile(
            li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"]
        ).collect()

    def q_docs_p95_by_lang():
        return tdigest_percentile(docs, "n_chars", 100, 0.95, keys=["lang"]).collect()

    def q_percentile_vector_global():
        qs = [i / 100 for i in range(1, 100)]
        return tdigest_percentile(li, "l_extendedprice", 100, qs).collect()

    def q_percentile_of_grouped():
        return tdigest_percentile_of(
            ev, "value", 100, 15.0, keys=["event_type"]
        ).collect()

    def q_trimmed_avg():
        return tdigest_avg(
            li, "l_extendedprice", 100, 0.1, 0.9, keys=["l_linestatus"]
        ).collect()

    def q_value_count_ingest():
        vc = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("cnt"))
        return tdigest_percentile(
            vc, "l_quantity", 100, 0.5, keys=["l_returnflag"], count_col="cnt"
        ).collect()

    def q_preagg_then_rollup():
        dig = tdigest(li, "l_extendedprice", 100, keys=["l_returnflag", "l_linestatus"])
        rolled = tdigest_union_agg(dig, "tdigest", keys=["l_returnflag"])
        return tdigest_percentile_digests(
            rolled, "tdigest", 0.9, keys=["l_returnflag"]
        ).collect()

    n_li = li.count()
    n_docs = docs.count()
    n_ev = ev.count()
    return {
        "build_p95_grouped": (q_build_p95_grouped, n_li),
        "docs_p95_by_lang": (q_docs_p95_by_lang, n_docs),
        "percentile_vector_global": (q_percentile_vector_global, n_li),
        "percentile_of_grouped": (q_percentile_of_grouped, n_ev),
        "trimmed_avg": (q_trimmed_avg, n_li),
        "value_count_ingest": (q_value_count_ingest, n_li),
        "preagg_then_rollup": (q_preagg_then_rollup, n_li),
    }


def main() -> None:
    from tdigest_spark.spark.session import get_spark

    from tdigest_spark.spark.session import warm_workers

    # settle BEFORE the suite too, not just the README pair: the
    # driver benches right after its own pytest+oracle passes, and the
    # sub-second suite queries measured uniformly ~15-20% slower while
    # that load tail (load1 ≈ 3-5) drained — below the old
    # README-pair-only threshold, so _settle never waited for them
    suite_load1 = _settle(target=2.0)
    suite_canary = _canary()

    spark = get_spark("tdigest-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)  # pre-import worker-side modules across the pool
    qs = bench_queries(spark, SF_DIR)

    # full warmup pass: JVM, python worker pool, parquet footers AND
    # first-touch page cache for EVERY input table, so per-query
    # timings measure steady-state query time, not file-touch order
    # (the reference's own harness averages 10 loops after warmup —
    # scripts/bechmark.sql:34-124)
    for fn, _rows in qs.values():
        _run(fn)

    total_rows = sum(rows for _fn, rows in qs.values())

    def _suite_pass() -> tuple[dict, float, float]:
        """One timed pass over the suite, with the co-tenant steal%
        accrued DURING the pass — load1-at-start alone missed a
        contended window where every query ran uniformly ~1.5-1.8×
        slow at near-zero idle steal (steal only accrues when you try
        to run; a pure-NumPy 32-way probe measured 7% steal and 0.22
        parallel efficiency in that window)."""
        st0, tot0 = _read_steal()
        timings: dict[str, float] = {}
        total_time = 0.0
        for name, (fn, _rows) in qs.items():
            reps = [_timed_rep(fn) for _ in range(3)]
            dt = sorted(reps)[1]  # median of 3
            timings[name] = round(dt, 4)
            total_time += dt
        st1, tot1 = _read_steal()
        steal = round(100 * (st1 - st0) / max(1, tot1 - tot0), 2)
        return timings, total_time, steal

    timings, total_time, suite_steal = _suite_pass()
    suite_discarded = None
    if suite_steal > 1.0:
        # contaminated pass: settle and re-run once, keep the
        # better-provenance result, record the discarded one
        _settle(target=2.0)
        t2, tt2, s2 = _suite_pass()
        if s2 < suite_steal:
            suite_discarded = {"total": round(total_time, 4), "steal_pct": suite_steal}
            timings, total_time, suite_steal = t2, tt2, s2
        else:
            suite_discarded = {"total": round(tt2, 4), "steal_pct": s2}

    # headline accuracy, aligned with the BASELINE metric
    from pyspark.sql import functions as F

    from tdigest_spark.spark.tdigest_agg import tdigest_percentile

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    est = tdigest_percentile(li, "l_extendedprice", 100, 0.95, keys=["l_returnflag"])
    ranks = _run(
        lambda: li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.avg((F.col("l_extendedprice") <= F.col("percentile")).cast("double")).alias(
                "r"
            )
        )
        .collect()
    )
    max_rank_err = max(abs(r["r"] - 0.95) for r in ranks)

    # flagship sketch-build throughput on a VOLUME-DOMINATED input:
    # grouped p95 over the cached 10M-row README table (sf0.1 tables
    # are sub-second jobs whose fixed task floor made this number
    # see-saw across rounds); median of 3 after warmup, reproducible
    # within ±10%
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import readme_bench as _rb

    if not os.path.exists(os.path.join(_rb.DEFAULT_DATA, "_SUCCESS")):
        _rb.generate(_rb.DEFAULT_DATA)
    big = spark.read.parquet(_rb.DEFAULT_DATA).select("a", "c")
    n_rows = big.count()

    def _flagship():
        return _timed_rep(
            lambda: tdigest_percentile(big, "c", 100, 0.95, keys=["a"]).collect()
        )

    _flagship()
    build_sec = sorted(_flagship() for _ in range(3))[1]

    # apples-to-apples rerun of the reference README's experiment
    # (10M rows (a int, b int, c double), grouped p95; PG: 2873.116 ms
    # single backend / 893.538 ms at 4 workers — README.md:138-154).
    # The parent 32-core JVM is done at this point — stop it so the
    # low-core subprocess measurements don't share the box with an
    # idle 8 GB heap (adds 100-500 ms of noise to a ~1 s job)
    spark.stop()

    def _readme_pair() -> dict:
        import subprocess

        pair: dict = {}
        # the ~1 s subprocess jobs are the bench's most load-sensitive
        # numbers — let the pytest/oracle load tail drain first.  The
        # round-5 record went through at load1=5.5 under the old
        # max(4, cpus/4)=8 threshold and regressed every number
        # 17-49%; hold the README pair to the SAME <=2 bar as the suite
        pair["load1_at_start"] = round(_settle(target=2.0), 1)
        pair["canary"] = _canary()
        st0, tot0 = _read_steal()
        here = os.path.dirname(os.path.abspath(__file__))
        for cores in (1, 4):
            # 5 reps: the ~1 s local[4] job sits near the task-dispatch
            # floor, where a median of 3 still jumps ±30% across fresh
            # JVMs; 5 reps stabilizes it within ~10%
            out = subprocess.run(
                [sys.executable, os.path.join(here, "scripts", "readme_bench.py"),
                 "--cores", str(cores), "--runs", "5"],
                capture_output=True, text=True, timeout=900, check=True,
            )
            pair[f"local{cores}_ms"] = json.loads(
                out.stdout.strip().splitlines()[-1]
            )["ms"]
        st1, tot1 = _read_steal()
        if tot1 > tot0:
            # interference provenance for the recorded numbers: steal%
            # of all vCPU time during the measurement window (multiply
            # by ~32/cores for the effective slowdown of the busy cores)
            pair["steal_pct"] = round(100 * (st1 - st0) / (tot1 - tot0), 2)
        return pair

    def _provenance(pair: dict) -> tuple:
        # lower is better: co-tenant steal first, then box load
        return (pair.get("steal_pct", 0.0), pair.get("load1_at_start", 0.0))

    readme = {}
    try:
        readme = _readme_pair()
        if (
            readme.get("load1_at_start", 0.0) > 2.5
            or readme.get("steal_pct", 0.0) > 1.0
        ):
            # the box was still hot (settle timed out) or a co-tenant
            # stole CPU mid-measurement: re-run ONCE and keep the run
            # with the better provenance, recording the other so the
            # discarded number stays auditable
            retry = _readme_pair()
            if _provenance(retry) < _provenance(readme):
                readme, discarded = retry, readme
            else:
                discarded = retry
            readme["discarded_attempt"] = discarded
        readme["pg_1worker_ms"] = 2873.116
        readme["pg_4worker_ms"] = 893.538
        readme["vs_pg_1w"] = round(readme["local1_ms"] / 2873.116, 3)
        readme["vs_pg_4w"] = round(readme["local4_ms"] / 893.538, 3)
    except Exception as exc:  # noqa: BLE001 — bench must still emit its line
        readme = {"error": str(exc)[:200]}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "tdigest_suite_total_time",
        "value": round(total_time, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "suite_load1_at_start": round(suite_load1, 1),
        "suite_canary": suite_canary,
        "suite_steal_pct": suite_steal,
        **({"suite_discarded": suite_discarded} if suite_discarded else {}),
        "rows_per_sec": int(total_rows / total_time) if total_time > 0 else None,
        "p95_rel_rank_error": round(max_rank_err, 6),
        "flagship_docs_per_sec": int(n_rows / build_sec) if build_sec else None,
        "flagship_note": "grouped p95 build over the 10M-row README table"
        " (volume-dominated; median of 3 after warmup)",
        "readme_10m_grouped_p95": readme,
        "scaling_efficiency_note": "see BENCH.md scaling table",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
