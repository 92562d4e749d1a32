"""Mid-plan materialization with an explicit fault-tolerance switch.

Several operators materialize a shared intermediate exactly once because it
feeds 3-4 differently-pruned consumers (exchange reuse cannot fire across
different prunings): TF-IDF's weight table, n-gram Jaccard's distinct
shingle set, label-propagation rounds.

Two strategies, chosen per session:

- ``localCheckpoint`` (default): fastest — blocks live on the executors
  that computed them, lineage is cut. The trade-off is fault tolerance:
  losing an executor (or scale-in under dynamic allocation) fails the job
  because the blocks are not recomputable. Right for static-allocation
  clusters and local runs; the blocks also live until the session ends.
- ``persist(MEMORY_AND_DISK)``: recomputable on executor loss and safe
  under dynamic allocation, at the cost of keeping lineage and going
  through the block-replication path. Set
  ``spark.arcane.materialize.faultTolerant=true`` to select it on
  long-running clusters.

Neither strategy is unpersisted mid-query — there is no completion hook
inside a single action; callers that loop (label propagation) unpersist
explicitly per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CONF_KEY = "spark.arcane.materialize.faultTolerant"


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a shared intermediate once (see module docstring)."""
    fault_tolerant = "false"
    try:
        fault_tolerant = df.sparkSession.conf.get(CONF_KEY, "false")
    except Exception:  # pragma: no cover — conf access is best-effort
        pass
    if str(fault_tolerant).lower() == "true":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)
