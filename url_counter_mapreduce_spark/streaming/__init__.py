"""Structured Streaming variants of the counting queries (SURVEY.md §2.3
X14). The reference is batch-only (§2.2); these are capability extensions."""
