"""Structured-Streaming realizations of the crawl dataflow."""
