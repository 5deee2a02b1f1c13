"""Operator modules. Each function builds a declarative DataFrame plan
(Catalyst optimizes; no hand-scheduling) and aliases every output column so
the DuckDB oracle in ``registry.ORACLES`` produces an identical schema."""
