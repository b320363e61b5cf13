"""Plan inspection utilities (SURVEY.md §4)."""
