"""Relational, SCD, dedup, similarity, quality and RLS operators."""
