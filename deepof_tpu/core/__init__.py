"""Core data structures: body graphs, table containers, storage."""
