"""timberjack_spark — a PySpark-native log/transcript analytics engine.

A brand-new distributed parse -> enrich -> route -> aggregate pipeline with the
query semantics of the timberjack log-analysis CLI (reference studied at
/root/reference, Rust), re-expressed Spark-first:

* DataFrame/Catalyst plans everywhere (no RDDs, no driver-side loops),
* one vectorized Arrow/pandas-UDF grok stage for multi-pattern text extraction,
* broadcast-join enrichment against role/tool dimensions,
* single-pass fan-out to per-category sinks,
* partial+final hash aggregation for every histogram the reference computes.

Designed for a 1000-executor cluster over ~10^12 transcript turns; tested on
local[N] with deterministic synthetic fixtures.
"""

__version__ = "0.1.0"
