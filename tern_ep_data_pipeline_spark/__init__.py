"""PySpark-native analytics engine with the capabilities of the reference
TERN-EP data pipeline (imchugh/TERN-EP_data_pipeline), rebuilt Spark-first.

The reference is a single-process pandas/xarray scientific ETL engine for a
network of eddy-covariance flux towers. This package re-expresses its full
operator surface (SURVEY.md §2) as idiomatic PySpark DataFrame/SQL transforms,
plus the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB lake needs.

Layout
------
- ``session``    : SparkSession builder tuned for the workload (AQE, Arrow).
- ``sources``    : table loaders, TOA5/EddyPro CSV reader/writer, TOB binary
                   decoder, netCDF shim.
- ``functions``  : unit conversions + meteorological derivations as pure
                   Column builders (reference: convert_calc_filter.py) —
                   JVM-side, Catalyst-optimisable, no UDFs.
- ``operators``  : DataFrame -> DataFrame transforms mirroring SURVEY.md §2
                   (conditioning, regularisation, gaps, masking, merge,
                   windows, status, reshape, dedup, similarity, text).
- ``plans``      : end-to-end pipeline compositions (L1 constructor et al.).
- ``streaming``  : Structured Streaming ingest variants.
"""

__version__ = "0.1.0"
