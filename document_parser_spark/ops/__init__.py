"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) built Spark-first on the same
engine conventions as the extraction pipeline: built-in functions in
the hot path, pandas/Arrow UDFs only where built-ins genuinely cannot
express the semantics, one explicit shuffle per logical aggregation.
"""
