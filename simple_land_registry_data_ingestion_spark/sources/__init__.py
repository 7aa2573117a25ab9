"""Sources: HTTP fetch (driver-side), CSV with declared schema, file formats."""
