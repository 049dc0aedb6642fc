"""crawlspark — a from-scratch PySpark-native rebuild of the query &
data-processing capabilities of benjaminestes/crawl (reference at
/root/reference, read-only): a batch-iterative URL-frontier + fetch
scheduler over snapshot tables of image+caption pairs, plus the
reference's BigQuery analysis corpus as native DataFrame queries and
large-scale training-data operators (dedup, similarity, text).

See SURVEY.md for the structural analysis and the operator inventory
this package implements.
"""

__version__ = "0.1.0"
