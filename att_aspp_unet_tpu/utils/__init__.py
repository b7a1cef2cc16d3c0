"""Utilities: torch checkpoint import, profiling, seeding, logging."""
