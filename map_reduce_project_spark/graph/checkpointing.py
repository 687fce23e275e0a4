"""Deterministic release of per-iteration localCheckpoint blocks.

Every iterative loop here follows the O9 discipline (one lazy/eager
``localCheckpoint`` per round + one materializing action — see
graph/ccf.py module docstring): lineage is truncated, so each round's
blocks are the ONLY copy of that round's state. Spark's ContextCleaner
frees them eventually — when the driver-side Python object is GC'd —
but "eventually" means a 7-iteration loop retains 7 generations of
blocks (measured: 1.4 GB on the 500k-edge CC probe; at 100 TB scale it
is eviction churn or an executor OOM). The moment round i+1 is
materialized, round i's blocks are garbage by construction; this
module releases them at exactly that point.

SAFETY: an unpersisted localCheckpoint CANNOT be recomputed (the
lineage is gone), so ``cycle()`` must only be called when everything
checkpointed before the previous ``cycle()`` call is truly dead:
after the new round's materializing action, and only when the loop
has committed to advancing (e.g. k-core's "no change" break returns
the PREVIOUS round — its cycle() call sits inside the advance branch).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """IDs of RDDs currently MARKED persistent.

    Uses ``getPersistentRDDs`` (the registration map), not
    ``getRDDStorageInfo`` (materialized blocks), for two reasons:

    - Registration happens at ``persist()``/``localCheckpoint()`` CALL
      time, before any block exists. A lazy checkpoint created by a
      caller before the loop is therefore already in ``known`` at
      cycler construction and can never be claimed by the loop — even
      if it first materializes mid-loop (the claim-scope hazard of the
      storage-info formulation).
    - Cost: one keySet().toArray() round-trip regardless of how many
      RDDs are persisted, vs one ``.id()`` py4j call per RDDInfo. On a
      fast small-graph loop the per-iteration driver round-trips are a
      measurable fraction of the iteration.
    """
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(rid) for rid in jmap.keySet().toArray()}


def _unpersist_rdds(spark: SparkSession, ids: set[int]) -> None:
    """Release blocks by RDD id (async, best-effort): a missing id
    (already cleaned) is fine; a cleaner race should not kill a
    converging loop over real data."""
    jsc_map = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        rdd = jsc_map.get(rid)
        if rdd is not None:
            try:
                rdd.unpersist(False)
            except Exception:  # pragma: no cover - cleaner race
                pass


class CheckpointCycler:
    """Tracks checkpoint generations for one loop and frees the
    previous generation each time the loop advances.

    Usage::

        cycler = CheckpointCycler(spark)   # AFTER loop-invariant
                                           # checkpoints (they are
                                           # never touched)
        while ...:
            df = step(df).localCheckpoint(eager=False)
            df.count()                     # materialize this round
            cycler.cycle()                 # free round i-1's blocks

    Anything MARKED persistent before construction — by this session's
    other queries, by loop-invariant tables, or by a caller's
    still-lazy checkpoint that has not materialized yet (registration
    happens at call time, see ``_persistent_rdd_ids``) — is in
    ``known`` and never released. The final generation is never
    released either (it backs the loop's result); it stays for the
    ContextCleaner.

    NOT safe under concurrent persists on the same session: a
    checkpoint created by a parallel query between two ``cycle()``
    calls would be claimed (and later freed) as if it were this
    loop's. Same single-driver-loop assumption as the loop's
    shuffle-partition override (graph/ccf.py) — run concurrent
    workloads on separate sessions.
    """

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self.known = _persistent_rdd_ids(spark)
        self.prev: set[int] = set()

    def cycle(self) -> None:
        new_ids = _persistent_rdd_ids(self.spark) - self.known
        if self.prev:
            _unpersist_rdds(self.spark, self.prev)
        self.prev = new_ids
        self.known |= new_ids
