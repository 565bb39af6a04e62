"""Structured Streaming twins of the reference's Samza applications."""
