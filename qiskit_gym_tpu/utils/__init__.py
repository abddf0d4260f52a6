"""Utilities: serialization, native-extension loading, logging."""
