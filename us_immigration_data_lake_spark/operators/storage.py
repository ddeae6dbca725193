"""Deterministic release of eager ``localCheckpoint`` storage.

An eager localCheckpoint truncates lineage by materializing the frame
into MEMORY_AND_DISK blocks; ContextCleaner only reaps those blocks
when driver GC happens to collect the RDD handle, so operators that
checkpoint per call (trainers' feature frames, the multi-table SRP
signature frames) would accumulate storage nondeterministically in a
long-lived session (r13/r14 advisors). This helper is the
deterministic release the old cache()+unpersist() pair had, without
giving up the lineage truncation — single-sourced here so the trainer
path (operators/training.py, releases in ``finally``) and the frames
contracts (similarity.py's ``"checkpointed"`` lists, the caller's to
release once pairs/oversized are materialized) can never drift."""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the MEMORY_AND_DISK blocks behind an eager
    ``localCheckpoint`` once no one will read the frame again.

    The checkpointed Dataset's analyzed plan is the LogicalRDD
    holding the persisted RDD; unpersisting a locally checkpointed
    RDD deletes its block data, which is exactly right for a frame
    nobody will read again (probe-verified to free storage, r14).
    Best-effort: if the internal plan shape ever changes, leaking
    (the old behavior) beats crashing a finished run."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
