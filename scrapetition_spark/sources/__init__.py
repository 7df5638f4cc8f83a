"""Sources & sinks: fixture/site generators, table catalog, dedup sinks."""
