"""Logical plans: the crawl epoch micro-batch and the multi-epoch loop."""
