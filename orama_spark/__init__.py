"""orama_spark — a PySpark-native full-text search engine.

A from-scratch distributed rebuild of the query/data-processing
capabilities of oramasearch/orama (reference at /root/reference,
Apache-2.0): inverted-index construction, BM25 top-k querying, filters,
facets, groups, vector & hybrid search — expressed as DataFrame plans
(Catalyst-optimized), with Arrow-vectorized UDFs only where built-in
operators cannot express the semantics (tokenization, posting-block
codecs).
"""

__version__ = "0.1.0"
