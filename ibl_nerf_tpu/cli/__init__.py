"""Command-line drivers and config front end."""
