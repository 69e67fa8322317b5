"""cord19_crawler_spark — a from-scratch PySpark-native URL-frontier + fetch
scheduler engine with the query/data-processing capabilities of the reference
``abdulbasitnikray-prog/cord19-crawler`` (see SURVEY.md).

Everything here is idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs for the few kernels Spark lacks, and explicit
partitioning/skew handling designed for a 1000-executor, 10^10-URL frontier
even though tests run on local[N].
"""

__version__ = "0.1.0"
