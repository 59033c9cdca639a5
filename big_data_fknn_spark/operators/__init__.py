"""Reusable DataFrame→DataFrame operators (the engine's library API)."""
