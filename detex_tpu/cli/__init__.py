"""Command-line apps: dtx-convert, dtx-view, dtx-validate."""
