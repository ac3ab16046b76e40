"""Pure-Python oracle: an independent, imperative implementation of the
pinned crawl semantics (reference-loop-shaped, SURVEY §3.1) used to verify
the distributed Spark plan end-to-end — crawl order + URL-seen set equality.
"""
