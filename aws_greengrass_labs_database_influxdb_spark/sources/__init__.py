"""Sources & sinks: line-protocol ingest, bucket store, auxiliary readers."""
