MERGE INTO iceberg.test.target t_o
USING (SELECT * FROM (
 SELECT *, rank() OVER (PARTITION BY ARCANE_MERGE_KEY ORDER BY versionnumber DESC) AS __arcane_rank FROM staged
) WHERE __arcane_rank = 1) t_s
ON t_o.ARCANE_MERGE_KEY = t_s.ARCANE_MERGE_KEY
WHEN MATCHED AND coalesce(t_s.IsDelete, false) = true THEN DELETE
WHEN MATCHED AND coalesce(t_s.IsDelete, false) = false AND t_s.versionnumber > t_o.versionnumber THEN UPDATE SET
  Id = t_s.Id,
  versionnumber = t_s.versionnumber,
  name = t_s.name
WHEN NOT MATCHED AND coalesce(t_s.IsDelete, false) = false THEN INSERT (ARCANE_MERGE_KEY,Id,versionnumber,name) VALUES (t_s.ARCANE_MERGE_KEY,t_s.Id,t_s.versionnumber,t_s.name)