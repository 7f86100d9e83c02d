"""Sources: table scans and fixture readers."""
