"""Storage layer: versioned (Delta-style) managed tables."""
