"""Distributed spatial + data-pipeline operators (DataFrame in, DataFrame out)."""
