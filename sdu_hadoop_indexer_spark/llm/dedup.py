"""Stub — filled in as operators land."""
