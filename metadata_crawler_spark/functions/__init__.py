"""Column-level building blocks (URL, hashing, text) — all either pure
Spark column expressions (JVM-side, codegen'd) or Arrow-vectorized pandas
UDFs. No row-at-a-time Python UDFs anywhere (input_hint contract).
"""
