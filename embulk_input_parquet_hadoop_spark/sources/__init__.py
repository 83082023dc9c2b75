"""Input sources: token-table datagen + parquet scan helpers."""
