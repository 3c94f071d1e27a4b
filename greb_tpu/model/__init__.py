"""Model core and drivers."""
