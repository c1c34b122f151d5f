"""Structured Streaming surface (SURVEY.md §2.9).

The reference's event loop is a hand-rolled micro-batch poll; the
crawl itself ports as deterministic batch rounds (the resumability
contract). This package carries the genuinely streaming-shaped
capabilities: incremental ingest of an events table with watermarked
event-time windows, runnable with ``availableNow`` for deterministic
tests and as a continuous micro-batch stream in production.
"""
