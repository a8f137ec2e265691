"""Structured Streaming extension surface.

The reference has no distributed streaming (SURVEY §2.8 — pigpen-rx is a
local lazy evaluator only); this package is pure extension: the same
Relation operators over ``readStream`` with watermarks/windows/state.
"""
