OPTIMIZE delta_cat.test.target ZORDER BY (ARCANE_MERGE_KEY, x)
---
OPTIMIZE delta_cat.test.target
---
VACUUM delta_cat.test.target RETAIN 72 HOURS