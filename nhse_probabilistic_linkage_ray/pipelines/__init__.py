"""End-to-end pipelines + the query catalog exposed to the driver contract."""
