"""HTML parsing stage: lenient DOM + listing/pagination/detail extractors
(pure functions) and their vectorized Spark UDF liftings."""
