"""Engine-level column functions (oracle-stable hashing, tokenization)."""
