"""Placeholder — K-group UDF surface."""
