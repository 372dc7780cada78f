"""PySpark-native analytics engine.

A library of named, pure query functions ``(spark, sf_dir) -> DataFrame``
over the driver's parquet testdata, covering the operator inventory in
SURVEY.md §2 (reference semantics per the canonical course handout, see
SURVEY.md §0 provenance notes) plus the LLM-data-pipeline extension ops.

Design stance (SURVEY.md §7.0): DataFrame-first, Catalyst does the
optimizing; native Column expressions everywhere; UDFs quarantined to the
declared ``udf_*`` keys; no collect() on hot paths; every query is a pure
function so the same code runs at sf0.001 and at 100 TB.
"""
