"""Column-level function library (native Catalyst expressions + pandas UDFs)."""
