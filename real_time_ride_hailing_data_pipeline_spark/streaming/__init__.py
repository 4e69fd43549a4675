"""Streaming layer: watermarked jobs (streaming/job.py) and idempotent
keyed upsert sinks (streaming/sinks.py)."""
