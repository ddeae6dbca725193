"""PLAN_HASHES.json freshness gate (r11 verdict ask #4).

The driver's correctness rotation gives queries whose OPTIMIZED plan
changed since their last gate a priority re-gate tier
(__spark_entry__.queries), keyed off the PLAN_HASHES.json snapshot.
That tier silently degrades if an engine change ships without
`scripts/plan_hashes.py` refreshing the snapshot — until r12 a
memory-level discipline, now a test: recompute the hashes of a
SENTINEL set of queries chosen to transitively cover the engine
modules most engine changes touch, and fail if any drifted from the
snapshot.

Why a subprocess and not the shared test session: the snapshot is
recorded under the engine's own session (get_spark: local[32],
defaultParallelism 32), and plans embed session-derived literals —
spread_by_id pins its exchange to defaultParallelism, so the conftest
session (parallelism 8) hashes the same plan differently. The gate
must replicate the recording environment exactly, which is what
`plan_hashes.py --check --only …` does (and the driver-facing tier
reads the same snapshot, so this is also the representative check).

Why sentinels and not all 232: a full recompute is a multi-minute
serial sweep (eager fns execute while building); the sentinels build
in well under a minute and cover dedup cap machinery, SRP similarity,
joins, windows/evaluation, sampling/order, textstats and the big
composites — any engine change that touches shared operator code
moves at least one of them. A change outside the sentinel closure
still reaches the driver tier when the author runs the refresh (the
documented post-change step); this gate exists to catch the FORGOTTEN
refresh, which by construction follows an operator edit.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One query per frequently-edited engine surface. The eager
# composites (q186/q188) are deliberately NOT sentinels: they execute
# their whole pipeline at build time (~15 s each in the subprocess)
# and their plan builders are exactly q20+q182+q187's — the sentinels
# cover the same drift for a fraction of the suite's wall clock.
SENTINELS = [
    "q01_pricing_summary",        # scan + agg core
    "q04_top_revenue_orders",          # join + global top-k
    "q20_minhash_near_dups",      # MinHash-LSH cap site (portable)
    "q76_binned_interval_join",      # range/interval join
    "q97_asof_forward",           # as-of join
    "q182_lsh_bucket_cap",        # cap machinery, both branches firing
    "q187_semantic_dedup_capped", # SRP bucket cap
    "q212_ks_drift",              # global_cumsum / drift family
    "q215_eval_auc",          # evaluation family
    "q228_mixture_interleave",    # sampling/order family (WFQ)
    "q229_script_profile",        # textstats regexp family
    "q230_hard_negatives",        # similarity scoring path
]


# The subprocess (own JVM, ~50-90 s) is fully independent of the test
# session, so START it at collection time — pytest imports every test
# module up front, and this file sits mid-alphabet, so the check runs
# CONCURRENTLY with the first half of the suite and the test below
# only joins an already-finished process (measured: the serial form
# was the suite's #3 wall-clock item at 90 s). Cost of the side
# effect: a filtered `-k` run that deselects the test still spawns
# the subprocess once — detached, bounded, and it never blocks.
_PROC = subprocess.Popen(
    [sys.executable, os.path.join(REPO, "scripts", "plan_hashes.py"),
     "--check", "--only", *SENTINELS],
    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
)


def test_sentinel_plan_hashes_fresh():
    out, err = _PROC.communicate(timeout=600)
    tail = "\n".join((out + err).splitlines()[-6:])
    assert _PROC.returncode == 0, (
        "PLAN_HASHES.json is stale for sentinel queries — an engine "
        "change rewrote executed plans without refreshing the snapshot, "
        "so the driver's plan-changed re-gate tier will not fire. Run "
        "`python scripts/plan_hashes.py` and commit the result.\n" + tail
    )
