"""mcp_hubspot_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MCP HubSpot server
(baryhuang/mcp-hubspot), re-expressed Spark-first.

Layout:
    session     SparkSession factory tuned for large-scale batch analytics
    schemas     explicit StructType registry (testdata tables + CRM entities)
    sources     parquet catalog / column-pruned loaders
    plans       filter-group predicate compiler (AND-in-group, OR-across-groups)
    operators   scans, joins, aggregates, top-k, vector search, dedup, text
    functions   scalar helpers + pluggable embedding UDF
    streaming   event-time windows / incremental ingest patterns
    serving     CDC-driven ANN index maintenance (IndexMaintainer)
    text_index  persisted inverted index (bucketed postings, BM25/phrase)
    api         façade mirroring the reference's 9 MCP tools

Every operator is a pure ``DataFrame -> DataFrame`` transformation: declare
the logical plan, let Catalyst/AQE pick the physical strategy. No collect()
in any operator; driver-side materialization happens only at the API edge.
"""

__version__ = "0.1.0"
