"""Relational crawl operators: robots gate, politeness window, URL-seen dedup."""
