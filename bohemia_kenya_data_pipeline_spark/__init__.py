"""bohemia_kenya_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark DataFrame/SQL engine with the query and
data-processing capabilities of databrew/bohemia-kenya-data-pipeline
(reference surveyed in SURVEY.md), re-expressed Spark-first:

- ``session``    — tuned SparkSession builder (AQE, Arrow, broadcast)
- ``catalog``    — zoned table registry + readers/writers (SURVEY §2.1)
- ``functions``  — scalar expression library (SURVEY §2.7)
- ``jobs``       — composed zone-transition jobs: clean / sanitize /
                   anomaly detection (SURVEY §3.2 DAG)
- ``operators``  — composable DataFrame->DataFrame operators:
    clean      C1-C11 resolution/sanitation engine (SURVEY §2.8)
    quality    anomaly-detector combinators + P8-P10 (§2.8, §3.2)
    windows    latest-per-key, fill-down, top-N, uncount, as-of,
               sessionize, seeded sampling (§2.5)
    reshape    scaffold/pivot/melt (§2.7 array/reshape)
    project    any_of/matches selection, bind_cols (P2/O5)
    spatial    haversine, point-in-polygon + buffer, nearest-neighbor
               (J11/J12/C8)
    stats      RDT state machine (W9), prevalence/incidence CIs
    dedup      exact / MinHash-LSH / SimHash / LSH-verified Jaccard /
               embedding near-dup (scale pack)
    similarity cosine top-k exact baseline, multi-table LSH ANN
    text       lang-ID, quality scoring, token counts, fingerprints
    multimodal binary payload + metadata, mapInPandas featurization
"""

__version__ = "0.1.0"
