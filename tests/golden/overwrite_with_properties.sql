CREATE OR REPLACE TABLE iceberg.test.target USING iceberg PARTITIONED BY (days(createdon)) TBLPROPERTIES ('write.format.default'='parquet', 'write.sort-order'='ARCANE_MERGE_KEY', 'write.parquet.bloom-filter-enabled.column.ARCANE_MERGE_KEY'='true') AS
SELECT * FROM (SELECT * FROM (
 SELECT *, rank() OVER (PARTITION BY ARCANE_MERGE_KEY ORDER BY versionnumber DESC) AS __arcane_rank FROM iceberg.test.combined
) WHERE __arcane_rank = 1) WHERE coalesce(IsDelete, false) = false