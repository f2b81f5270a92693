"""Shared small utilities."""
