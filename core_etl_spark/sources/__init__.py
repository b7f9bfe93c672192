"""Sources: raw-block ingestion (batch JSON dumps standing in for the
node's JSON-RPC), deterministic chain fixtures, and streaming feeds."""
