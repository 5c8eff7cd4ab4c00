"""Decompose a query's COLD wall: plan-construction time (fn() call,
no action), then the first count() broken into per-job walls and
driver-side gaps via the UI REST API. Warm run timed after for
reference.

Usage: python scripts/profile_cold.py [query_name] [sf_dir]
"""

from __future__ import annotations

import datetime
import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")


def _jobs(base: str):
    return json.load(urllib.request.urlopen(base + "/jobs"))


def report(jobs, label, wall):
    jobs = sorted(jobs, key=lambda j: j["jobId"])
    tot, gap_total, prev_end = 0.0, 0.0, None
    rows = []
    for j in jobs:
        if "completionTime" not in j:
            continue
        d = (_ts(j["completionTime"]) - _ts(j["submissionTime"])).total_seconds()
        gap = 0.0
        if prev_end is not None:
            gap = max(0.0, (_ts(j["submissionTime"]) - prev_end).total_seconds())
        gap_total += gap
        prev_end = _ts(j["completionTime"])
        tot += d
        rows.append((j, d, gap))
    print(f"--- {label}: wall {wall:.2f}s, {len(jobs)} jobs, "
          f"sum-job {tot:.2f}s, inter-job gaps {gap_total:.2f}s, "
          f"pre/post slack {wall - tot - gap_total:.2f}s")
    for j, d, gap in rows:
        if d >= 0.15 or gap >= 0.15:
            print(f"  job {j['jobId']:>4} {d:6.2f}s (+gap {gap:5.2f}s) "
                  f"stages={len(j['stageIds'])} tasks={j['numTasks']} "
                  f"| {(j.get('description') or j.get('name') or '')[:90]}")


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "tagger_w1_rank_headline"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pids_drg_esoa_spark.plans.catalog import all_specs
    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="prof-cold", ui=True)
    fn = all_specs()[name].fn
    app = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app}"

    t0 = time.time()
    df = fn(spark, sf)
    t_build = time.time() - t0
    jobs_build = _jobs(base)

    t0 = time.time()
    df.count()
    t_exec = time.time() - t0
    jobs_after = _jobs(base)
    build_ids = {j["jobId"] for j in jobs_build}

    print(f"{name}: plan-construction {t_build:.2f}s  first-action {t_exec:.2f}s  "
          f"cold-total {t_build + t_exec:.2f}s")
    report(jobs_build, "during fn() construction", t_build)
    report([j for j in jobs_after if j["jobId"] not in build_ids],
           "during first count()", t_exec)

    maxjob = max(j["jobId"] for j in jobs_after)
    t0 = time.time()
    fn(spark, sf).count()
    warm = time.time() - t0
    jobs_warm = [j for j in _jobs(base) if j["jobId"] > maxjob]
    report(jobs_warm, "warm re-run (build+exec)", warm)
    spark.stop()


if __name__ == "__main__":
    main()
