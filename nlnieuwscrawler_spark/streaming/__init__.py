"""Structured Streaming: the epoch loop as micro-batches + stateful ops."""
