"""Scalar/analytic function layer: text analysis for LLM-data pipelines."""
