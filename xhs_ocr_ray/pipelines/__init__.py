"""End-to-end pipelines (the E1 analog)."""
