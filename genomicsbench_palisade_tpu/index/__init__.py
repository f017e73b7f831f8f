"""FM-index construction, conversion, and on-disk formats."""
