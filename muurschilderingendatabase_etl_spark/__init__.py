"""PySpark-native analytics engine with the capabilities of
cultureelerfgoed/muurschilderingendatabase-etl, rebuilt Spark-first.

Layout:
- ``session``   — SparkSession factory tuned for scale (AQE, Arrow, UTC).
- ``tables``    — driver-fixture table loaders (TESTDATA.md parquet).
- ``registry``  — query registration: every operator is a named
  ``(spark, sf_dir) -> DataFrame`` plus an equivalent DuckDB oracle SQL.
- ``queries``   — the operator inventory from SURVEY.md §2.3.
- ``rdf``       — the reference's own surface (SURVEY.md §2.1): triples
  model, Turtle parse/serialize, cleanup/rename/filter/enrich.
- ``streaming`` — Structured Streaming operators on the events table.
"""

__version__ = "0.1.0"
