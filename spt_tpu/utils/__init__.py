"""Utilities: timing, telemetry."""
