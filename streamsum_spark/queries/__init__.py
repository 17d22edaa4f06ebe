"""Read-side query API over the count cache (SURVEY.md §2.B)."""
