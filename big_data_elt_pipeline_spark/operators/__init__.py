"""DataFrame→DataFrame operator library (SURVEY.md §2 inventory)."""
