"""Structured Streaming half of the engine: the live tail (reference
etl.rs:126-176) and windowed/watermarked stream aggregations (SURVEY §2.8)."""
