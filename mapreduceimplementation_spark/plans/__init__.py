"""Relational / event analytics plans (SURVEY.md §2 B*)."""
