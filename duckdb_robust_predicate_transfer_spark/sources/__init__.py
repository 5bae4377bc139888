"""Data sources. Parquet is the primary source (catalog.Catalog);
streaming sources live in streaming/."""
