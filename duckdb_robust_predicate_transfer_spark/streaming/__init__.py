"""Structured Streaming operators (watermarked windows, sessionization).
Batch twins of these queries live in workload/pipeline.py."""
