"""Engine-portable Bloom filter for benchmark-contamination probing.

A production decontamination pass (GPT-3 appendix C, Gopher §A.2) checks
every corpus n-gram against the benchmark suite. ``corpus.contamination``
does the exact join; at 100 TB the benchmark gram *set* is still small
(MBs) but the join key is a long string — a Bloom filter over the grams
cuts the broadcast payload to a bit set and makes the probe a pure
integer membership test, at the price of a bounded false-positive rate.

This implementation is **deterministic across engines**: instead of an
opaque bitmap with library-specific hashing (Spark's
``bloom_filter_agg`` vs anything DuckDB could do), the "filter" is the
set of *set bit positions* — ``k`` positions per gram, each derived from
``md5(gram || '#' || salt)`` reduced mod ``m`` exactly the same way on
both engines (the repo-standard ``conv(substr(md5, 1, 15), 16, 10)``
trick, `corpus.py::hash_split`). Membership = "all ``k`` positions
present", which reproduces Bloom semantics *including the false
positives* bit-for-bit, so a DuckDB oracle can hash-match the result.

Scale shape (100 TB corpus, MB-scale benchmark):

- the bit set is ``≤ k × |bench grams|`` longs — **broadcast**, the
  corpus side never shuffles for the membership join;
- each corpus gram gains its ``k`` positions in the projection and the
  membership test is ``k`` sequential **broadcast left joins** (one per
  hash), so there is exactly ONE wide shuffle in the whole plan: the
  final per-document hash aggregation (map-side combined);
- the per-document distinct grams come from ``corpus._distinct_grams``
  (``array_distinct`` inside the projection — no dedup shuffle).

No counterpart in the reference (it has no text operators); this extends
the corpus-curation family (SURVEY §7.2 step 11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.corpus import _distinct_grams

__all__ = [
    "bloom_bits",
    "bloom_probe",
    "bloom_probe_sql",
]


def _pos(col, salt: int, m: int):
    """Bit position ``md5(g || '#salt') mod m`` as a non-negative long —
    15 hex chars (60 bits) so the conv never overflows int64."""
    h = F.md5(F.concat(col, F.lit(f"#{salt}")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m


def bloom_bits(
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """The Bloom filter itself: distinct set bit positions ``(pos)`` over
    the benchmark side's distinct ``n``-grams."""
    g = _distinct_grams(bench, id_col, text_col, n, "bid")
    return (
        g.select(
            F.explode(
                F.array(*[_pos(F.col("g"), i, m) for i in range(k)])
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Probe every corpus document's ``n``-grams against the benchmark
    Bloom filter.

    Output: ``(id_col, n_grams, n_flagged)`` — distinct grams per doc and
    how many tested Bloom-positive (true hits **plus** deterministic
    false positives; at ``m=2^20, k=3`` and ~40k benchmark grams the FP
    rate is ≈(k·g/m)³ ≈ 2e-6).
    """
    # the bit set feeds k broadcast builds — materialize it once instead
    # of re-scanning the benchmark per salt (bounded: it's the small side)
    bits = bloom_bits(bench, id_col, text_col, n, m, k).localCheckpoint(
        eager=False
    )
    probed = _distinct_grams(corpus, id_col, text_col, n, "id")
    hits = []
    for i in range(k):
        b = bits.select(
            F.col("pos").alias(f"pos{i}"), F.lit(1).alias(f"hit{i}")
        )
        probed = probed.withColumn(f"pos{i}", _pos(F.col("g"), i, m)).join(
            F.broadcast(b), f"pos{i}", "left"
        )
        hits.append(F.col(f"hit{i}").isNotNull())
    flagged = hits[0]
    for h in hits[1:]:
        flagged = flagged & h
    return (
        probed.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(flagged.cast("long")).alias("n_flagged"),
        )
        .withColumnRenamed("id", id_col)
    )


def bloom_probe_sql(
    corpus_pred: str,
    bench_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m: int = 1 << 20,
    k: int = 3,
) -> str:
    """DuckDB oracle for :func:`bloom_probe` — the identical hash
    construction, so even the false positives match."""
    grams = f"""
  SELECT DISTINCT {id_col} AS id, array_to_string(w[i:i+{n - 1}], ' ') AS g
  FROM (SELECT {id_col}, string_split({text_col}, ' ') AS w
        FROM {table} WHERE {{pred}})
  CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) - {n} + 2)) AS i) AS u(i)
"""

    def pos(salt: int) -> str:
        return (
            f"CAST(concat('0x', substr(md5(g || '#{salt}'), 1, 15)) "
            f"AS BIGINT) % {m}"
        )

    salted = " UNION ".join(
        f"SELECT {pos(i)} AS pos FROM bg" for i in range(k)
    )
    flagged = " AND ".join(f"b{i}.pos IS NOT NULL" for i in range(k))
    joins = "\n".join(
        f"  LEFT JOIN bits b{i} ON {pos(i)} = b{i}.pos" for i in range(k)
    )
    return f"""
WITH bg AS ({grams.format(pred=bench_pred)}),
bits AS ({salted}),
cg AS ({grams.format(pred=corpus_pred)}),
per_gram AS (
  SELECT id, CASE WHEN {flagged} THEN 1 ELSE 0 END AS flagged
  FROM cg
{joins}
)
SELECT id AS {id_col},
       count(*) AS n_grams,
       CAST(sum(flagged) AS BIGINT) AS n_flagged
FROM per_gram
GROUP BY id
""".strip()
