"""weather_api_automate_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``caphey/weather-api-automate-etl`` (an Airflow + dbt-on-Postgres weather ELT
pipeline), re-expressed Spark-first:

- the declared relational semantics of the dbt models (normalization, ILIKE
  categorization, range bucketing, date parts, md5 surrogate keys, grouped
  min/max/count, the star-schema join) become native DataFrame operators
  optimized by Catalyst (``operators/``),
- the dbt ``unique``/``not_null``/``accepted_values`` schema tests become
  reusable data-quality operators (``operators/quality.py``),
- the row-at-a-time REST ingestion becomes a distributed batch source with
  error-record routing (``sources/``),
- the Airflow DAG becomes a fail-fast pipeline runner with retries
  (``plans/pipeline.py``),
- the daily micro-batch becomes optional Structured Streaming with watermarks
  (``streaming/``),
- and the surface is extended with scale-ready LLM-data-pipeline operators:
  exact + MinHash/SimHash/Jaccard/cosine dedup, top-k similarity search,
  text analysis, and multimodal-column plumbing (``operators/dedup.py``,
  ``similarity.py``, ``textops.py``; ``sources/multimodal.py``).

Blueprint: /root/repo/SURVEY.md (every operator cites the reference file:line).
"""

__version__ = "0.1.0"
