"""Scalar function layer: URL canonicalization + HTML extraction.

Pure-Python cores live beside their Arrow-batched pandas-UDF wrappers so
the same byte-exact logic powers the Spark pipeline, the synthetic
corpus generator, and the pure-Python BFS oracle used in tests.
"""
