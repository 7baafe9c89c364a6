"""PySpark-native SROIE-style extraction engine (see SURVEY.md)."""

__version__ = "0.1.0"
