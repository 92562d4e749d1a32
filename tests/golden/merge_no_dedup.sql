MERGE INTO iceberg.test.target t_o
USING (SELECT * FROM staged) t_s
ON t_o.ARCANE_MERGE_KEY = t_s.ARCANE_MERGE_KEY
WHEN MATCHED AND t_s.createdon > t_o.createdon THEN UPDATE SET
  createdon = t_s.createdon,
  a = t_s.a,
  b = t_s.b
WHEN NOT MATCHED THEN INSERT (ARCANE_MERGE_KEY,createdon,a,b) VALUES (t_s.ARCANE_MERGE_KEY,t_s.createdon,t_s.a,t_s.b)