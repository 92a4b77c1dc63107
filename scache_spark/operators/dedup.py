"""Placeholder - queries land next commit."""
