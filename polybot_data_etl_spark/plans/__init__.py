"""Assembled query plans / driver entry points."""
