"""PySpark-native analytics engine with the query/data-processing
capabilities of vkoll29/Evidence-Images-ETL-Airflow.

The reference is an Airflow 2.6.3 + pandas ETL (see SURVEY.md); this
package re-expresses its operator semantics Spark-first: declarative
DataFrame plans optimized by Catalyst, vectorized parquet scans,
broadcast/sort-merge joins picked by AQE, and Arrow-batched Pandas UDFs
only where built-ins genuinely cannot express the semantics.

Layout:
    session      SparkSession factory tuned for local[N] and cluster runs
    schemas      StructType registry for the reference's fixed DDL schemas
    sources      pruned parquet scans, JDBC reads, file-arrival sensors
    functions    column-expression library (coercions, arrays, text, vectors)
    operators    relational operators (projection, union, upsert, dedup, ANN)
    plans        composed end-to-end pipelines (EP1 evidence, EP2 image_urls)
    sinks        validated append / idempotent upsert / staging-merge writers
    streaming    Structured Streaming analogs of the reference's sensors
"""

__version__ = "0.1.0"
