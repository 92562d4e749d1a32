CALL iceberg.system.rewrite_data_files(table => 'test.target', options => map('target-file-size-bytes', '268435456'))
---
CALL iceberg.system.expire_snapshots(table => 'test.target', older_than => TIMESTAMP '2026-01-12 12:00:00+00:00')
---
CALL iceberg.system.remove_orphan_files(table => 'test.target', older_than => TIMESTAMP '2026-01-12 12:00:00+00:00')
---
ANALYZE TABLE iceberg.test.target COMPUTE STATISTICS FOR COLUMNS ARCANE_MERGE_KEY, x