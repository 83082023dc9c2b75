"""Encode pipeline, decode/verify, resumable manifest."""
