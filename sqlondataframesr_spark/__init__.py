"""sqlondataframesr_spark — a PySpark-native analytics engine.

Re-expresses the query capability surface of the reference repo
rafalbojarczuk/SQLonDataFramesR (six SQL queries over dataframes,
differentially tested against an oracle engine — see
/root/reference/RDataFramesSQL.Rmd) as an idiomatic Spark engine:

- ``session``   — SparkSession factory (AQE, partition sizing, Arrow).
- ``catalog``   — parquet table loading + temp-view registration (the
  analogue of sqldf's implicit data.frame import,
  RDataFramesSQL.Rmd:75).
- ``queries``   — the reference's six query shapes transposed onto the
  synthetic star schema, each in fluent-DataFrame AND Spark-SQL form,
  plus LLM-data-pipeline operators (dedup, similarity, text analysis)
  and streaming windows the reference lacks.
- ``check``     — differential comparison harness (the analogue of
  dplyr::all_equal against sqldf, RDataFramesSQL.Rmd:40-53).

Everything is built DataFrame-first so Catalyst handles pushdown,
pruning, join selection and AQE re-planning; Python UDFs appear only
where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
