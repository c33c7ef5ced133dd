"""Datamart / star-schema view definitions."""
