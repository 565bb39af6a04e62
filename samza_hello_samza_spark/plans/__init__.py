"""Declarative analytics plans (Catalyst-optimized DataFrame queries)."""
