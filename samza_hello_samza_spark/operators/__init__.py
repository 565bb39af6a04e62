"""Batch operators re-expressing the reference's Samza surface."""
