"""Logical plans: the per-round crawl pipeline and the driver loop."""
