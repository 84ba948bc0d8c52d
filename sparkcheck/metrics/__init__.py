"""Metric builders: conditions (per-row booleans), aggregates (fused slots),
sketches (drift scoring), audio (Arrow pandas UDF invariants)."""
