"""dynaalign_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine with the query capabilities of syl051088/DynaAlign
(MinHash k-shingle similarity -> quantile threshold -> Louvain cluster
breaking), re-grounded for image+caption dedup at web scale (SURVEY.md)."""

__version__ = "0.1.0"
