"""Structured Streaming: streaming ingest + event analytics.

The reference defers streaming to v2 ("watch folder deferred",
/root/reference/mcpvectordb-implementation-plan.md:24); we implement the
Spark-native version."""
