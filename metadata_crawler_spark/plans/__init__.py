"""Crawl plans: the micro-batch round loop (batch) — see also
``metadata_crawler_spark.streaming`` for the Structured-Streaming variant.
"""
