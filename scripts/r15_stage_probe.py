"""r15 optimization round: per-job/per-stage breakdown of one or more
headline queries via the Spark event log (guide §1/§7 — find WHERE the
wall-clock goes before touching anything).

Usage: python scripts/r15_stage_probe.py <query> [query ...] [--sf DIR]

For each query: a warm-up noop run, then a timed noop run with the
event log enabled; the probe then parses the event log and prints, per
job, the wall span and the stages (name, task count, executor-run ms,
shuffle read/write bytes) sorted by cost. Driver gaps (time between
jobs — planning, codegen, collects, checkpoint scheduling) are printed
as the residual, since at bench scale they are often the real cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_immigration_data_lake_spark.plans.queries import QUERIES  # noqa: E402
from us_immigration_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    args: list[str] = []
    skip_next = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip_next:
            skip_next = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip_next = True  # the flag's VALUE is not a query name
        elif not a.startswith("--"):
            args.append(a)
    evdir = "/tmp/r15_eventlogs"
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "r15-stage-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    marks: dict[str, tuple[float, float]] = {}
    for name in args:
        fn = QUERIES[name].fn
        # warm-up (codegen + JIT), mirroring bench.py's protocol
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(f"TIMED:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        marks[name] = (t0, t1)
        spark.catalog.clearCache()
        print(f"== {name}: wall {t1 - t0:.3f}s", flush=True)

    spark.stop()
    _report(os.path.join(evdir, app_id), marks)


def _report(path: str, marks: dict[str, tuple[float, float]]) -> None:
    import glob

    # Spark 4 rolling layout: eventlog_v2_<appId>/events_1_<appId>
    if not os.path.isfile(path):
        cands = glob.glob(
            os.path.join(os.path.dirname(path), f"*{os.path.basename(path)}*")
        )
        files: list[str] = []
        for c in cands:
            files.extend(sorted(glob.glob(os.path.join(c, "events_*"))) if
                         os.path.isdir(c) else [c])
        path = files[0] if files else path
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"] / 1e3,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"] / 1e3
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                st = stages.setdefault(si["Stage ID"], {})
                st.update({
                    "name": si["Stage Name"].split("\n")[0],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time", 0) / 1e3,
                    "done": si.get("Completion Time", 0) / 1e3,
                })
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                tm = ev.get("Task Metrics") or {}
                st["run_ms"] = st.get("run_ms", 0) + tm.get(
                    "Executor Run Time", 0
                )
                st["ser_ms"] = st.get("ser_ms", 0) + tm.get(
                    "Executor Deserialize Time", 0
                )
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                st["sh_r"] = st.get("sh_r", 0) + sr.get(
                    "Remote Bytes Read", 0
                ) + sr.get("Local Bytes Read", 0)
                st["sh_w"] = st.get("sh_w", 0) + sw.get(
                    "Shuffle Bytes Written", 0
                )

    for name, (t0, t1) in marks.items():
        print(f"\n===== {name}  wall={t1 - t0:.3f}s =====")
        span_jobs = [
            (jid, j) for jid, j in sorted(jobs.items())
            if j.get("start", 0) >= t0 - 0.05 and j.get("end", t1) <= t1 + 0.05
        ]
        # union of job intervals: wall minus this = pure driver time
        # (planning, analysis, codegen, collect post-processing)
        ivals = sorted(
            (j["start"], j.get("end", j["start"])) for _, j in span_jobs
        )
        busy, cur_s, cur_e = 0.0, None, None
        for s, e in ivals:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    busy += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            busy += cur_e - cur_s
        qstages = []
        for _, j in span_jobs:
            for sid in j["stages"]:
                s = stages.get(sid)
                if s and s.get("done"):
                    qstages.append((sid, s))
        qstages = {sid: s for sid, s in qstages}
        tot_span = sum(s["done"] - s["sub"] for s in qstages.values())
        tot_run = sum(s.get("run_ms", 0) for s in qstages.values())
        print(
            f"  jobs={len(span_jobs)} stages={len(qstages)} "
            f"job-busy={busy:.3f}s driver-only={t1 - t0 - busy:.3f}s "
            f"stage-span-sum={tot_span:.3f}s executor-run-sum={tot_run / 1e3:.3f}s"
        )
        top = sorted(
            qstages.items(), key=lambda kv: kv[1]["done"] - kv[1]["sub"],
            reverse=True,
        )[:18]
        for sid, s in top:
            print(
                f"    stage {sid:>5} span={(s['done'] - s['sub']) * 1e3:6.0f}ms "
                f"run={s.get('run_ms', 0):6d}ms tasks={s.get('tasks', 0):3d} "
                f"shR={s.get('sh_r', 0) // 1024:6d}K shW={s.get('sh_w', 0) // 1024:6d}K "
                f"[{s.get('name', '?')[:70]}]"
            )


if __name__ == "__main__":
    main()
