"""Sources: synthetic corpus generation and table readers."""
