SELECT * FROM (
 SELECT *, rank() OVER (PARTITION BY ARCANE_MERGE_KEY ORDER BY createdon DESC) AS __arcane_rank FROM iceberg.test.combined
) WHERE __arcane_rank = 1