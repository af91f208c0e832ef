"""Operator library: each module maps to a SURVEY.md §2 tier."""
