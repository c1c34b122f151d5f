"""Sources: synthetic Common-Crawl-style corpus + table IO helpers."""
