"""r16 (r15 verdict ask #6): make the multimodal mapInPandas
projection (guide §4) MEASURABLE — a wide-frame micro-benchmark that
prices the Arrow-boundary byte reduction of the r15 change
(`select("media_id", "content")` before every mapInPandas op).

Builds a WIDE parquet (media_id, content, + 3 fat decoy columns of
~content size each), then runs `resize_media` twice:

- ENGINE path (r15+): the operator projects internally, so column
  pruning reaches the parquet scan (ReadSchema = media_id, content)
  and only those columns cross JVM -> Arrow -> Python;
- UNPROJECTED control: the same batch function applied via
  mapInPandas on the wide frame directly — the pre-r15 caller shape;
  the opaque Python function defeats pruning, every column is read
  from storage AND shipped across the boundary both ways.

Reports per-variant: wall seconds, scan Bytes Read (task input
metrics — storage-side proof), and the executed ReadSchema line
(plan-side proof). Output lands in SCALE.md's Arrow-boundary row.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from us_immigration_data_lake_spark.session import get_spark  # noqa: E402

ROWS = 512
BLOB = 16_384  # bytes per content cell (and per decoy cell)


def main() -> None:
    evdir = "/tmp/r16_arrow_eventlogs"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "r16-arrow-boundary-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from pyspark.sql import functions as F

    from us_immigration_data_lake_spark.operators import multimodal as mm

    path = "/tmp/r16_wide_media.parquet"
    shutil.rmtree(path, ignore_errors=True)
    # deterministic P6 PPM payloads (the real resize codec path) + fat
    # INCOMPRESSIBLE decoy columns a wide production frame would carry
    # (transcripts, raw features, provenance blobs) — sha256-expanded
    # per row so parquet cannot RLE them away and the scan-bytes delta
    # is visible in the task input metrics
    import hashlib

    header = b"P6\n64 64\n255\n"
    body = bytes((i * 31 + 7) % 256 for i in range(64 * 64 * 3))
    blob = header + body

    def noise(tag: bytes, row: int) -> bytes:
        out = bytearray()
        ctr = 0
        while len(out) < BLOB:
            out += hashlib.sha256(tag + b"%d:%d" % (row, ctr)).digest()
            ctr += 1
        return bytes(out[:BLOB])

    rows = [
        (
            i,
            blob,
            noise(b"t", i),
            noise(b"f", i),
            noise(b"p", i),
        )
        for i in range(ROWS)
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, decoy_transcript binary, "
        "decoy_features binary, decoy_prov binary",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    wide = spark.read.parquet(path)

    windows: dict[str, tuple[float, float]] = {}

    def timed(tag: str, frame) -> tuple[float, str]:
        # warm-up, then timed (codegen/JIT parity with bench protocol)
        frame().write.mode("overwrite").format("noop").save()
        t0 = time.time()
        out = frame()
        out.write.mode("overwrite").format("noop").save()
        t1 = time.time()
        windows[tag] = (t0, t1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        schema_line = next(
            (
                ln.strip()
                for ln in plan.splitlines()
                if "ReadSchema" in ln
            ),
            "",
        )
        return t1 - t0, schema_line

    # ENGINE path: resize_media projects internally (r15)
    w_proj, rs_proj = timed(
        "projected", lambda: mm.resize_media(wide, 32, 32)
    )

    # UNPROJECTED control: the pre-r15 caller shape — identical
    # per-row work, but the mapInPandas consumes the WIDE frame with
    # no select, so pruning never reaches the scan and every decoy
    # column crosses the Arrow boundary
    def unprojected():
        from us_immigration_data_lake_spark.operators import codecs

        def _resize_batches(it):
            import pandas as pd

            for pdf in it:
                rows = []
                for mid, b in zip(pdf["media_id"], pdf["content"]):
                    px = codecs.decode_ppm(bytes(b))
                    rows.append(
                        (
                            mid,
                            codecs.encode_ppm(
                                codecs.resize_nearest(px, 32, 32)
                            ),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["media_id", "content"]
                )

        return wide.mapInPandas(
            _resize_batches, "media_id long, content binary"
        )

    w_wide, rs_wide = timed("unprojected", unprojected)

    spark.stop()

    # task input metrics per probe window from the event log
    import glob

    files = sorted(
        glob.glob(os.path.join(evdir, f"*{app_id}*/events_*"))
        or glob.glob(os.path.join(evdir, f"*{app_id}*"))
    )
    # the DIRECT boundary metric: every ArrowEvalPython / MapInPandas
    # node carries "data sent to Python workers" / "data returned from
    # Python workers" SQL metrics — they arrive as task accumulator
    # updates in the event log. Attribute by the timed windows.
    sent: dict[str, int] = {"projected": 0, "unprojected": 0}
    recv: dict[str, int] = {"projected": 0, "unprojected": 0}
    scan: dict[str, int] = {"projected": 0, "unprojected": 0}
    with open(files[0]) as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            info = ev.get("Task Info") or {}
            fin = info.get("Finish Time", 0) / 1e3
            tag = next(
                (
                    t
                    for t, (t0, t1) in windows.items()
                    if t0 - 0.05 <= fin <= t1 + 0.05
                ),
                None,
            )
            if tag is None:
                continue
            tm = ev.get("Task Metrics") or {}
            im = tm.get("Input Metrics") or {}
            scan[tag] += im.get("Bytes Read", 0)
            for acc in info.get("Accumulables", []):
                name = acc.get("Name", "")
                try:
                    upd = int(acc.get("Update", 0))
                except (TypeError, ValueError):
                    continue
                if name == "data sent to Python workers":
                    sent[tag] += upd
                elif name == "data returned from Python workers":
                    recv[tag] += upd

    print(
        json.dumps(
            {
                "probe": "arrow_boundary",
                "rows": ROWS,
                "projected": {
                    "wall_sec": round(w_proj, 3),
                    "arrow_bytes_to_python": sent["projected"],
                    "arrow_bytes_from_python": recv["projected"],
                    "scan_bytes_read": scan["projected"],
                    "read_schema": rs_proj[:200],
                },
                "unprojected_control": {
                    "wall_sec": round(w_wide, 3),
                    "arrow_bytes_to_python": sent["unprojected"],
                    "arrow_bytes_from_python": recv["unprojected"],
                    "scan_bytes_read": scan["unprojected"],
                    "read_schema": rs_wide[:200],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
