"""bohemia_kenya_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark DataFrame/SQL engine with the query and
data-processing capabilities of databrew/bohemia-kenya-data-pipeline
(reference surveyed in SURVEY.md), re-expressed Spark-first:

- ``session``    — tuned SparkSession builder (AQE, Arrow, broadcast)
- ``catalog``    — zoned table registry + readers/writers (SURVEY §2.1)
- ``functions``  — scalar expression library (SURVEY §2.7)
- ``operators``  — composable DataFrame->DataFrame operators:
    clean      C1-C11 resolution/sanitation engine (SURVEY §2.8)
    windows    latest-per-key, fill-down, top-N, uncount, as-of (§2.5)
    reshape    pivot/melt/scaffold (§2.7 array/reshape)
    quality    anomaly-detector combinators (§2.8, §3.2)
    spatial    haversine, point-in-polygon, nearest-neighbor (J11/J12)
    stats      prevalence/incidence CIs, RDT state machine (W9)
    dedup      exact / MinHash-LSH / SimHash / n-gram Jaccard /
               embedding near-dup (scale pack)
    similarity cosine top-k ANN, LSH-bucketed variant (scale pack)
    text       lang-ID, quality scoring, token counts, fingerprints
    multimodal binary-column plumbing (decode stubs)
"""

__version__ = "0.1.0"
