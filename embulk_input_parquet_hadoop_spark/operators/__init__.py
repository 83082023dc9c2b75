"""Column encoders, codec selector, dedup/similarity/text operators."""
