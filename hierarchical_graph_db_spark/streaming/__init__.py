"""Structured Streaming layer (SURVEY.md §2.8 + M4).

The reference's Celery+Redis task stream maps to Structured Streaming:
micro-batch file sources replace the task queue, ``foreachBatch`` with the
idempotent dedup-merge replaces the unique-index upsert (exactly-once
effects), and watermarked event-time windows are the north-star additions
the reference never had.
"""
