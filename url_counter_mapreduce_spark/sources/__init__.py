"""Input sources. The engine's tables are parquet (tables.py); this package
holds the reference-native whitespace-text source (SURVEY.md O1)."""
