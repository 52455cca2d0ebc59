"""Scalar function library.

- ``pure``: plain-Python reference implementations (shared by the vectorized
  UDFs, the HTML parsers, and the pytest oracles).
- ``native``: pyspark.sql Column expressions — JVM-side, whole-stage-codegen
  friendly; always preferred in the hot path.
- ``pandas_udfs``: Arrow-batched vectorized UDFs for the few operations Spark
  has no native expression for (Unicode NFKC / category tables, RFC-3986
  relative-URL resolution, charset sniffing, Chinese numerals).
"""
