"""etl_adsbx_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `dfpc-coe/etl-adsbx`
(ADS-B Exchange → Cursor-on-Target ETL), generalized to a full relational
surface plus LLM-data-pipeline operators, designed for 100 TB scale.

Layout (see SURVEY.md §7):
    session.py         SparkSession builder with scale-oriented defaults
    schemas.py         StructTypes: ADSBResponse / includes / envelope / driver tables
    tables.py          parquet table loaders for the driver test data
    fixtures.py        reference-faithful aircraft/includes fixtures
    functions/         scalar / text / vector column-expression libraries
    operators/         dedup, joins, agg, similarity, multimodal
    pipeline.py        the aircraft→CoT control() dataflow (reference task.ts:115-258)
    sources/           HTTP micro-batch adapter, validated JSON ingest
    sinks.py           FeatureCollection assembly / file sinks
    streaming/         event-time windows, watermarks, stateful dedup
    queries.py         driver-contract registry: queries() + oracle_sql()
"""

__version__ = "0.1.0"
