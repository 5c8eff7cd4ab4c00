"""Profile the tagger_w1_rank_headline fixed cost (VERDICT r9 #5).

Runs the headline cold+warm with the Spark UI enabled, then reads the
UI REST API to break the WARM run's wall into per-job durations and
driver-side gaps (planning / py4j / collect time between jobs). The
gaps are the 'fixed cost' the judge asked to shave: pandas_udf worker
spin-up shows as short wide jobs; Catalyst planning shows as gaps.

Usage: python scripts/profile_tagger_headline.py [query_name]
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


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "tagger_w1_rank_headline"
    from pids_drg_esoa_spark.plans.catalog import all_specs
    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="prof", ui=True)
    specs = all_specs()
    sf = "/root/testdata/sf0.1"
    fn = specs[name].fn

    t0 = time.time()
    fn(spark, sf).count()
    cold = time.time() - t0

    app = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app}"
    jobs_before = json.load(urllib.request.urlopen(base + "/jobs"))
    maxjob = max((j["jobId"] for j in jobs_before), default=-1)

    t0 = time.time()
    fn(spark, sf).count()
    warm = time.time() - t0
    print(f"{name}: cold {cold:.2f}s warm {warm:.2f}s  ({len(jobs_before)} prior jobs)")

    jobs = [j for j in json.load(urllib.request.urlopen(base + "/jobs")) if j["jobId"] > maxjob]
    jobs.sort(key=lambda j: j["jobId"])
    tot = 0.0
    prev_end = None
    gap_total = 0.0
    for j in jobs:
        d = (_ts(j["completionTime"]) - _ts(j["submissionTime"])).total_seconds()
        gap = 0.0
        if prev_end is not None:
            gap = max(0.0, (_ts(j["submissionTime"]) - prev_end).total_seconds())
        gap_total += gap
        prev_end = _ts(j["completionTime"])
        tot += d
        print(
            f"  job {j['jobId']:>4} {d:6.2f}s (+gap {gap:5.2f}s) "
            f"stages={len(j['stageIds'])} tasks={j['numTasks']} | {(j.get('name') or '')[:80]}"
        )
    print(
        f"jobs={len(jobs)} sum-job-wall={tot:.2f}s inter-job-gaps={gap_total:.2f}s "
        f"pre/post-slack={warm - tot - gap_total:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
