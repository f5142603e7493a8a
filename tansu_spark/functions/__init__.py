"""Training-data-pipeline function library: text analysis, deduplication,
similarity search, multimodal plumbing. All hot-path expressions are
JVM-side built-ins (no Python row UDFs); Pandas UDFs appear only where
semantics genuinely require them (multimodal decode stubs)."""
