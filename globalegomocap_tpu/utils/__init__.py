"""Cross-cutting utilities: profiling, logging, misc."""
